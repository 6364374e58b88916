"""Baseline JPEG (ITU-T T.81) codec — pure struct + numpy, no external libs.

Closes the last compressed-codec gap in the multimodal pipeline
(`ops/multimodal.py` previously raised NotImplementedError for JPEG).
Everything here derives from the PUBLIC spec:

- Decoder: baseline sequential DCT (SOF0) AND progressive DCT (SOF2,
  round 7 — Annex G: spectral selection, successive approximation, EOB
  runs, DC/AC first+refinement scans, interleaved DC), 8-bit precision,
  grayscale or YCbCr with any sampling factors up to 2x2 (4:4:4 /
  4:2:2 / 4:2:0), restart markers (DRI/RSTn), byte-stuffing (FF 00).
  Since the repo's media convention reduces images to BT.601 luma
  anyway (see `multimodal._make_decoder`), only the Y component is
  dequantized and IDCT'd; baseline chroma blocks are still
  entropy-decoded (the bitstream cannot be advanced otherwise) but skip
  the transform, and progressive chroma-only scans are skipped
  WHOLESALE (each scan's entropy segment is self-delimiting — zero bit
  work). Arithmetic coding / 12-bit / lossless / hierarchical raise
  with a clear message.
- Encoder (test/fixture side): grayscale or RGB->YCbCr (JFIF full-range
  BT.601), optional 2x2 chroma subsampling, optional restart interval,
  Annex-K example quantization matrices scaled by the libjpeg quality
  formula, and Huffman tables built per-image from the spec's OWN
  algorithm (Annex K figures K.1 CODE_SIZE / K.2 COUNT_BITS / K.3
  Adjust_BITS, including the reserved all-ones dummy symbol) — so no
  giant default-table constants are transcribed.

Reference parity: the reference ships media blobs through opaque binary
columns and leans on external decoders; this repo decodes baseline JPEG
in-repo so `media_quality` / `media_features` work on real payloads with
zero extra dependencies.

Executor shipping: `make_jpeg_decoder()` returns a CLOSURE (pickled
by value through cloudpickle) exactly like `multimodal._make_decoder`,
so driver-contract sessions that lack this package on executor
PYTHONPATH still run it.

IDCT/FDCT are exact float implementations (8x8 basis-matrix products,
vectorized over all blocks at once) — not the integer fast-DCT
approximations, so round-trip error is bounded by quantization alone.
"""

from __future__ import annotations

import numpy as np

# Natural-order index of each zigzag position k (T.81 Figure 5).
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 / K.2 example quantization matrices (natural order).
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """C[u, x] = c(u)/2 * cos((2x+1)u*pi/16); f = C.T @ F @ C, F = C @ f @ C.T."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * 0.5
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public jpeglib convention)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Spec-algorithm Huffman table construction (Annex K figures K.1-K.3)
# --------------------------------------------------------------------------


def _huffman_spec(freq_in: dict[int, int]) -> tuple[list[int], list[int]]:
    """BITS (len-16 counts) + HUFFVAL from symbol frequencies, via the
    spec's own CODE_SIZE / COUNT_BITS / Adjust_BITS procedure. The
    reserved symbol 256 gets frequency 1 so no real symbol is assigned
    the all-ones code (T.81 K.2 note)."""
    freq = np.zeros(257, dtype=np.int64)
    for sym, f in freq_in.items():
        freq[sym] = f
    freq[256] = 1
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)

    while True:
        nz = np.nonzero(freq)[0]
        if len(nz) < 2:
            if len(nz) == 1 and codesize[nz[0]] == 0:
                codesize[nz[0]] = 1
            break
        # v1 = least frequent (largest index breaks ties per spec)
        fmin = freq[nz].min()
        v1 = nz[freq[nz] == fmin].max()
        nz2 = nz[nz != v1]
        fmin2 = freq[nz2].min()
        v2 = nz2[freq[nz2] == fmin2].max()
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1

    bits = np.zeros(33, dtype=np.int64)  # COUNT_BITS
    for i in range(257):
        if codesize[i]:
            bits[min(codesize[i], 32)] += 1

    i = 32  # Adjust_BITS (fold code lengths >16 back)
    while i > 16:
        if bits[i] > 0:
            j = i - 1
            while True:
                j -= 1
                if bits[j] > 0:
                    break
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        else:
            i -= 1
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # remove the reserved-symbol code slot

    # HUFFVAL: symbols sorted by (codesize, symbol), reserved 256 dropped
    order = sorted(
        (s for s in range(256) if codesize[s]), key=lambda s: (codesize[s], s)
    )
    return [int(b) for b in bits[1:17]], order


def _assign_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): sym -> (length, code)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (ln, code)
            k += 1
            code += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    """Magnitude category (number of bits) for a DC diff / AC coef."""
    a = abs(int(v))
    t = 0
    while a:
        a >>= 1
        t += 1
    return t


# --------------------------------------------------------------------------
# Encoder (fixtures/tests; driver-side)
# --------------------------------------------------------------------------


def encode_jpeg(
    px: np.ndarray,
    quality: int = 85,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder. `px` is (h, w) uint8 grayscale or (h, w, 3)
    uint8 RGB. `subsample=(2,2)` emits 4:2:0 chroma. Per-image optimal
    Huffman tables (spec Annex K algorithm) are written to DHT."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
        samps = [(1, 1)]
        qts = [_scaled_qt(QT_LUMA, quality)]
        comp_qt = [0]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sh, sv = subsample
        if (sh, sv) not in ((1, 1), (2, 2), (2, 1)):
            raise ValueError(f"unsupported subsample {subsample}")

        def down(p: np.ndarray) -> np.ndarray:
            if (sh, sv) == (1, 1):
                return p
            ph = -(-h // sv) * sv
            pw = -(-w // sh) * sh
            pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            return pad.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))

        planes = [y, down(cb), down(cr)]
        samps = [(sh, sv), (1, 1), (1, 1)]
        qts = [_scaled_qt(QT_LUMA, quality), _scaled_qt(QT_CHROMA, quality)]
        comp_qt = [0, 1, 1]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    C = _dct_basis()

    # Pad each plane to its MCU-aligned size and pre-split into blocks.
    comp_blocks: list[np.ndarray] = []  # (mcuy, mcux, v, hh, 8, 8) quantized ints
    for ci, plane in enumerate(planes):
        chh, cv = samps[ci]
        ph, pw = mcuy * cv * 8, mcux * chh * 8
        pl = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks = pl.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ux,ijxy,vy->ijuv", C, blocks, C)  # FDCT all blocks
        qt = qts[comp_qt[ci]].reshape(8, 8).astype(np.float64)
        q = np.round(coef / qt).astype(np.int64)
        comp_blocks.append(
            q.reshape(mcuy, cv, mcux, chh, 8, 8).transpose(0, 2, 1, 3, 4, 5)
        )

    # Serialize blocks MCU-interleaved into (dc_sym, dc_extra), ac symbol runs.
    n_tables = 1 if gray else 2
    dc_freq = [dict() for _ in range(n_tables)]
    ac_freq = [dict() for _ in range(n_tables)]
    ri = int(restart_interval)

    def block_symbols(zz: np.ndarray, pred: int, ti: int, record: bool):
        syms = []
        diff = int(zz[0]) - pred
        t = _category(diff)
        syms.append(("dc", t, diff))
        if record:
            dc_freq[ti][t] = dc_freq[ti].get(t, 0) + 1
        k = 1
        run = 0
        last = 0
        for k in range(1, 64):
            if zz[k]:
                last = k
        for k in range(1, last + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                syms.append(("ac", 0xF0, 0))
                if record:
                    ac_freq[ti][0xF0] = ac_freq[ti].get(0xF0, 0) + 1
                run -= 16
            s = _category(int(zz[k]))
            rs = (run << 4) | s
            syms.append(("ac", rs, int(zz[k])))
            if record:
                ac_freq[ti][rs] = ac_freq[ti].get(rs, 0) + 1
            run = 0
        if last < 63:
            syms.append(("ac", 0x00, 0))
            if record:
                ac_freq[ti][0x00] = ac_freq[ti].get(0x00, 0) + 1
        return syms, int(zz[0])

    # Pass 1: collect symbol frequencies; Pass 2 re-walks to emit bits.
    def walk(emit):
        preds = [0] * len(planes)
        mcu_n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and mcu_n and mcu_n % ri == 0:
                    preds = [0] * len(planes)
                    if emit is not None:
                        emit("rst", (mcu_n // ri - 1) % 8, 0, 0)
                for ci in range(len(planes)):
                    chh, cv = samps[ci]
                    ti = 0 if ci == 0 else 1
                    for by in range(cv):
                        for bx in range(chh):
                            blk = comp_blocks[ci][my, mx, by, bx]
                            zz = blk.flatten()[ZIGZAG]
                            syms, dc = block_symbols(
                                zz, preds[ci], ti, emit is None
                            )
                            preds[ci] = dc
                            if emit is not None:
                                for kind, sym, val in syms:
                                    emit(kind, sym, val, ti)
                mcu_n += 1

    walk(None)
    dc_tabs = [_huffman_spec(f or {0: 1}) for f in dc_freq]
    ac_tabs = [_huffman_spec(f or {0: 1}) for f in ac_freq]
    dc_codes = [_assign_codes(*t) for t in dc_tabs]
    ac_codes = [_assign_codes(*t) for t in ac_tabs]

    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def put_bits(code: int, length: int):
        nonlocal bitbuf, bitcnt
        if length == 0:
            return
        bitbuf = (bitbuf << length) | (code & ((1 << length) - 1))
        bitcnt += length
        while bitcnt >= 8:
            byte = (bitbuf >> (bitcnt - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)  # byte stuffing
            bitcnt -= 8
        bitbuf &= (1 << bitcnt) - 1

    def flush_bits():
        nonlocal bitbuf, bitcnt
        if bitcnt:
            put_bits((1 << (8 - bitcnt)) - 1, 8 - bitcnt)  # 1-pad

    def emit(kind, sym, val, ti=0):
        if kind == "rst":
            flush_bits()
            out.extend(bytes((0xFF, 0xD0 + sym)))
            return
        table = dc_codes[ti] if kind == "dc" else ac_codes[ti]
        ln, code = table[sym]
        put_bits(code, ln)
        t = sym & 0x0F if kind == "ac" else sym
        if kind == "dc":
            t = sym
        if t:
            v = val if val >= 0 else val + (1 << t) - 1
            put_bits(v, t)

    # ---- headers ----
    hdr = bytearray(b"\xff\xd8")  # SOI
    hdr += b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" \
        + b"\x00\x01\x00\x01\x00\x00"  # APP0
    for ti in range(n_tables):
        zzq = qts[ti][ZIGZAG]
        hdr += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([ti]) \
            + bytes(int(v) for v in zzq)
    # SOF0
    ncomp = len(planes)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        chh, cv = samps[ci]
        sof += bytes([ci + 1, (chh << 4) | cv, comp_qt[ci]])
    hdr += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for ti in range(n_tables):
        for cls, (bits, vals) in ((0, dc_tabs[ti]), (1, ac_tabs[ti])):
            body = bytes([(cls << 4) | ti]) + bytes(bits) + bytes(vals)
            hdr += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
    if ri:
        hdr += b"\xff\xdd" + (4).to_bytes(2, "big") + ri.to_bytes(2, "big")
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    hdr += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    walk(emit)
    flush_bits()
    return bytes(hdr) + bytes(out) + b"\xff\xd9"  # EOI


# --------------------------------------------------------------------------
# Progressive encoder (fixtures/tests; grayscale — the repo's media
# convention reduces to luma anyway). T.81 Annex G encoding procedures:
# spectral selection bands + successive approximation, per-scan optimal
# Huffman tables, EOB-run batching (libjpeg's encode_mcu_AC_* control
# flow re-derived from the spec).
# --------------------------------------------------------------------------


def encode_jpeg_progressive(
    px: np.ndarray,
    quality: int = 85,
    dc_al: int = 1,
    ac_al: int = 1,
    bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """Progressive JFIF encoder (SOF2), grayscale. Scan plan: DC first at
    point transform `dc_al` + DC refinements to 0; per-band AC first at
    `ac_al` + per-band refinements to 0 — exercising every progressive
    decode path (DC/AC, first/refine, EOB runs). The quantized
    coefficients are IDENTICAL to `encode_jpeg`'s at the same quality,
    so progressive and baseline decodes of the same image must agree
    pixel-exactly — the round-trip law the tests pin."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim != 2:
        raise NotImplementedError(
            "progressive encoder is grayscale-only (the decode side "
            "handles color payloads; fixtures are luma)"
        )
    h, w = px.shape
    bh, bw = -(-h // 8), -(-w // 8)
    C = _dct_basis()
    qt = _scaled_qt(QT_LUMA, quality)
    pl = np.pad(
        px.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )
    blocks = pl.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,ijxy,vy->ijuv", C, blocks, C)
    q = np.round(coef / qt.reshape(8, 8).astype(np.float64)).astype(np.int64)
    zz = q.reshape(bh, bw, 64)[..., ZIGZAG]  # natural→zigzag order

    scans: list[tuple] = [("dc_first", 0, 0, dc_al)]
    for lvl in range(dc_al - 1, -1, -1):
        scans.append(("dc_refine", 0, 0, lvl))
    for ss, se in bands:
        scans.append(("ac_first", ss, se, ac_al))
    for lvl in range(ac_al - 1, -1, -1):
        for ss, se in bands:
            scans.append(("ac_refine", ss, se, lvl))

    def scan_symbols(kind, ss, se, al, emit):
        """Walk blocks emitting (huffman symbol, (value, nbits) extras)
        through `emit(sym, extras)`; emit(None, extras) = raw bits with
        no symbol. Two-pass: freq collection (emit records) then bits."""
        if kind == "dc_first":
            pred = 0
            for by in range(bh):
                for bx in range(bw):
                    t_ = int(zz[by, bx, 0]) >> al  # arithmetic shift (G.1.2.1)
                    diff = t_ - pred
                    pred = t_
                    s = _category(diff)
                    v = diff if diff >= 0 else diff + (1 << s) - 1
                    emit(("dc", s), [(v, s)] if s else [])
            return
        if kind == "dc_refine":
            for by in range(bh):
                for bx in range(bw):
                    emit(None, [((int(zz[by, bx, 0]) >> al) & 1, 1)])
            return
        # AC scans: EOB-run batching state spans blocks
        eobrun = 0
        pending: list = []  # correction bits buffered across the EOB run

        def flush_eob():
            nonlocal eobrun, pending
            if eobrun > 0:
                r = eobrun.bit_length() - 1
                emit(("ac", r << 4), [(eobrun - (1 << r), r)] if r else [])
                eobrun = 0
            if pending:
                emit(None, pending)
                pending = []

        for by in range(bh):
            for bx in range(bw):
                band = zz[by, bx, ss : se + 1]
                if kind == "ac_first":
                    t = np.sign(band) * (np.abs(band) >> al)
                    nz = np.nonzero(t)[0]
                    if len(nz) == 0:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    last = nz[-1]
                    for k in range(last + 1):
                        v = int(t[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            emit(("ac", 0xF0), [])
                            run -= 16
                        s = _category(v)
                        ev = v if v >= 0 else v + (1 << s) - 1
                        emit(("ac", (run << 4) | s), [(ev, s)])
                        run = 0
                    if last < se - ss:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                else:  # ac_refine (G.1.2.3 / libjpeg encode_mcu_AC_refine)
                    absv = np.abs(band) >> al
                    nz1 = np.nonzero(absv == 1)[0]
                    eob = (nz1[-1] + 1) if len(nz1) else 0
                    run = 0
                    br: list = []  # correction bits since last emitted sym
                    for k in range(len(band)):
                        a = int(absv[k])
                        if a == 0:
                            run += 1
                            continue
                        # ZRL check precedes BOTH branches (G.1.2.3 /
                        # libjpeg): a 16+ zero-history run must flush
                        # even when the next nonzero is a correction
                        while run > 15 and k <= eob - 1:
                            flush_eob()
                            emit(("ac", 0xF0), [])
                            emit(None, br)
                            br = []
                            run -= 16
                        if a > 1:  # already significant: correction bit
                            br.append((a & 1, 1))
                            continue
                        # newly significant (a == 1)
                        flush_eob()
                        emit(("ac", (run << 4) | 1), [(1 if band[k] > 0 else 0, 1)])
                        emit(None, br)
                        br = []
                        run = 0
                    if run > 0 or br:
                        eobrun += 1
                        pending.extend(br)
                        if eobrun == 0x7FFF or len(pending) > 900:
                            flush_eob()
        flush_eob()

    # headers: SOI, APP0, DQT, SOF2
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00"
        + b"\x00\x01\x00\x01\x00\x00"
    )
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([0]) + bytes(
        int(v) for v in qt[ZIGZAG]
    )
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([1])  # one component
    sof += bytes([1, 0x11, 0])  # id=1, 1x1 sampling, qt 0
    out += b"\xff\xc2" + (len(sof) + 2).to_bytes(2, "big") + sof

    for kind, ss, se, al in scans:
        # pass 1: per-scan symbol frequencies (refinement-only scans have
        # none and need no DHT)
        freq: dict[int, int] = {}

        def rec(sym, extras):
            if sym is not None:
                freq[sym[1]] = freq.get(sym[1], 0) + 1

        scan_symbols(kind, ss, se, al, rec)
        codes = None
        if freq:
            bits_, vals_ = _huffman_spec(freq)
            codes = _assign_codes(bits_, vals_)
            cls = 0 if kind.startswith("dc") else 1
            body = bytes([(cls << 4) | 0]) + bytes(bits_) + bytes(vals_)
            out += b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body
        # SOS
        ah = 0 if kind.endswith("first") else al + 1
        sos = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
        # pass 2: entropy bits
        bitbuf = 0
        bitcnt = 0
        ent = bytearray()

        def put_bits(code, length):
            nonlocal bitbuf, bitcnt
            if length == 0:
                return
            bitbuf = (bitbuf << length) | (code & ((1 << length) - 1))
            bitcnt += length
            while bitcnt >= 8:
                byte = (bitbuf >> (bitcnt - 8)) & 0xFF
                ent.append(byte)
                if byte == 0xFF:
                    ent.append(0x00)
                bitcnt -= 8
            bitbuf &= (1 << bitcnt) - 1

        def emit(sym, extras):
            if sym is not None:
                ln, code = codes[sym[1]]
                put_bits(code, ln)
            for v, t in extras:
                put_bits(v, t)

        scan_symbols(kind, ss, se, al, emit)
        if bitcnt:
            put_bits((1 << (8 - bitcnt)) - 1, 8 - bitcnt)
        out += ent
    return bytes(out) + b"\xff\xd9"


# --------------------------------------------------------------------------
# Decoder (executor-safe closure)
# --------------------------------------------------------------------------


def make_jpeg_decoder():
    """Returns decode(payload: bytes) -> (h, w) uint8 luma. Self-contained
    closure (cloudpickle ships it by value; only numpy referenced)."""
    import numpy as _np

    zigzag = _np.array(ZIGZAG)  # captured as a plain array cell
    _x = _np.arange(8)
    _C = _np.cos((2 * _x[None, :] + 1) * _x[:, None] * _np.pi / 16) * 0.5
    _C[0, :] *= 1.0 / _np.sqrt(2.0)

    def _progressive_decode(
        data, n, pos, comps, scan, spectral, qt, huff, ri, h, w
    ):
        """Progressive DCT (SOF2, T.81 Annex G decoding): multiple scans
        accumulate the LUMA coefficient grid — DC first/refine (point
        transform via shift + successive-approximation OR), AC first
        (band RLE + EOB runs), AC refine (correction bits, libjpeg's
        decode_mcu_AC_refine control flow). Scans that do not touch the
        luma component are SKIPPED wholesale (their entropy segment is
        self-delimiting) — the repo's media convention only consumes
        luma, and a skipped chroma scan costs zero bit work."""
        ly_id = comps[0][0]
        lcomp = comps[0]
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        lh, lv = lcomp[1], lcomp[2]
        BY, BX = mcuy * lv, mcux * lh
        ycoef = _np.zeros((BY, BX, 64), dtype=_np.int64)

        def comp_blocks_dims(c):
            cw = -(-w * c[1] // hmax)
            ch = -(-h * c[2] // vmax)
            return -(-ch // 8), -(-cw // 8)

        def slurp_entropy(start):
            """entropy segments (RST-split, FF00-unstuffed) + end offset."""
            segs, cur, i = [], bytearray(), start
            while i < n:
                b = data[i]
                if b == 0xFF and i + 1 < n:
                    m = data[i + 1]
                    if m == 0x00:
                        cur.append(0xFF)
                        i += 2
                        continue
                    if 0xD0 <= m <= 0xD7:
                        segs.append(bytes(cur))
                        cur = bytearray()
                        i += 2
                        continue
                    break
                cur.append(b)
                i += 1
            segs.append(bytes(cur))
            return segs, i

        def decode_scan(scan_comps, spec, segs, ri_now):
            Ss, Se, Ah, Al = spec
            seg_i = 0
            buf = segs[0]
            bpos = 0
            blen = len(buf) * 8

            def read_bit():
                nonlocal bpos
                if bpos >= blen:
                    return 0
                byte = buf[bpos >> 3]
                bit = (byte >> (7 - (bpos & 7))) & 1
                bpos += 1
                return bit

            def read_bits(t):
                v = 0
                for _ in range(t):
                    v = (v << 1) | read_bit()
                return v

            def huffdec(table):
                code = 0
                for ln in range(1, 17):
                    code = (code << 1) | read_bit()
                    sym = table.get((ln, code))
                    if sym is not None:
                        return sym
                raise ValueError("invalid JPEG huffman code")

            def extend(v, t):
                return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

            def next_segment():
                nonlocal seg_i, buf, bpos, blen
                seg_i += 1
                if seg_i < len(segs):
                    buf = segs[seg_i]
                    bpos = 0
                    blen = len(buf) * 8

            infos = []
            for cid, dct, act in scan_comps:
                c = next(cc for cc in comps if cc[0] == cid)
                infos.append((cid, c[1], c[2], dct, act))
            p1 = 1 << Al

            if Ss == 0:  # --- DC scan (interleaved or single) ---
                preds = {cid: 0 for cid, *_ in infos}
                if len(infos) > 1:  # interleaved over the MCU grid
                    mcu_n = 0
                    for my in range(mcuy):
                        for mx in range(mcux):
                            if ri_now and mcu_n and mcu_n % ri_now == 0:
                                next_segment()
                                preds = {cid: 0 for cid, *_ in infos}
                            for cid, chh, cv, dct, _act in infos:
                                dtab = huff.get((0, dct))
                                for by in range(cv):
                                    for bx in range(chh):
                                        zz = (
                                            ycoef[my * lv + by, mx * lh + bx]
                                            if cid == ly_id
                                            else None
                                        )
                                        if Ah == 0:
                                            t = huffdec(dtab)
                                            diff = (
                                                extend(read_bits(t), t)
                                                if t
                                                else 0
                                            )
                                            preds[cid] += diff
                                            if zz is not None:
                                                zz[0] = preds[cid] * p1
                                        else:
                                            bit = read_bit()
                                            if bit and zz is not None:
                                                zz[0] = int(zz[0]) | p1
                            mcu_n += 1
                else:  # single component, true block dims
                    cid, chh, cv, dct, _act = infos[0]
                    c = next(cc for cc in comps if cc[0] == cid)
                    bh, bw = comp_blocks_dims(c)
                    dtab = huff.get((0, dct))
                    bn = 0
                    for by in range(bh):
                        for bx in range(bw):
                            if ri_now and bn and bn % ri_now == 0:
                                next_segment()
                                preds[cid] = 0
                            zz = ycoef[by, bx] if cid == ly_id else None
                            if Ah == 0:
                                t = huffdec(dtab)
                                diff = extend(read_bits(t), t) if t else 0
                                preds[cid] += diff
                                if zz is not None:
                                    zz[0] = preds[cid] * p1
                            else:
                                bit = read_bit()
                                if bit and zz is not None:
                                    zz[0] = int(zz[0]) | p1
                            bn += 1
                return

            # --- AC scan: spec-mandated single component (== luma; the
            # caller skips non-luma AC scans entirely) ---
            cid, chh, cv, _dct, act = infos[0]
            atab = huff.get((1, act))
            bh, bw = comp_blocks_dims(lcomp)
            eobrun = 0
            bn = 0
            for by in range(bh):
                for bx in range(bw):
                    if ri_now and bn and bn % ri_now == 0:
                        next_segment()
                        eobrun = 0
                    bn += 1
                    zz = ycoef[by, bx]
                    if Ah == 0:  # --- AC first (G.1.2.2) ---
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = Ss
                        while k <= Se:
                            rs = huffdec(atab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r < 15:
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += read_bits(r)
                                    break
                                k += 16
                                continue
                            k += r
                            if k > Se:
                                raise ValueError("JPEG AC overflow")
                            zz[k] = extend(read_bits(s), s) * p1
                            k += 1
                    else:  # --- AC refinement (G.1.2.3) ---
                        m1 = -p1
                        k = Ss
                        if eobrun == 0:
                            while k <= Se:
                                rs = huffdec(atab)
                                r, s = rs >> 4, rs & 0x0F
                                val = 0
                                if s == 0:
                                    if r < 15:
                                        eobrun = 1 << r
                                        if r:
                                            eobrun += read_bits(r)
                                        break
                                    # r == 15: skip 16 zero-history coefs
                                else:
                                    val = p1 if read_bit() else m1
                                while k <= Se:
                                    c0 = int(zz[k])
                                    if c0 != 0:
                                        if read_bit() and (abs(c0) & p1) == 0:
                                            zz[k] = c0 + (p1 if c0 >= 0 else m1)
                                    else:
                                        if r == 0:
                                            if val:
                                                zz[k] = val
                                            k += 1
                                            break
                                        r -= 1
                                    k += 1
                        if eobrun > 0:
                            while k <= Se:
                                c0 = int(zz[k])
                                if c0 != 0:
                                    if read_bit() and (abs(c0) & p1) == 0:
                                        zz[k] = c0 + (p1 if c0 >= 0 else m1)
                                k += 1
                            eobrun -= 1

        # --- multi-scan loop: decode/skip scans until EOI ---
        cur_scan, cur_spec, cur_pos = scan, spectral, pos
        while True:
            segs, end = slurp_entropy(cur_pos)
            touches_luma = any(cid == ly_id for cid, *_ in cur_scan)
            if touches_luma:
                decode_scan(cur_scan, cur_spec, segs, ri)
            cur_scan = None
            p2 = end
            while p2 + 2 <= n:
                if data[p2] != 0xFF:
                    p2 += 1
                    continue
                marker = data[p2 + 1]
                if marker == 0xD9:
                    break
                if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                    p2 += 2
                    continue
                if p2 + 4 > n:
                    break
                seglen = int.from_bytes(data[p2 + 2 : p2 + 4], "big")
                body = data[p2 + 4 : p2 + 2 + seglen]
                if marker == 0xC4:  # DHT between scans
                    i = 0
                    while i < len(body):
                        tc, th = body[i] >> 4, body[i] & 0x0F
                        counts = body[i + 1 : i + 17]
                        i += 17
                        table = {}
                        code = 0
                        for ln in range(1, 17):
                            for _ in range(counts[ln - 1]):
                                table[(ln, code)] = body[i]
                                i += 1
                                code += 1
                            code <<= 1
                        huff[(tc, th)] = table
                elif marker == 0xDB:  # DQT between scans
                    i = 0
                    while i < len(body):
                        pq, tq = body[i] >> 4, body[i] & 0x0F
                        i += 1
                        if pq:
                            qt[tq] = _np.frombuffer(
                                body[i : i + 128], dtype=">u2"
                            ).astype(_np.int64)
                            i += 128
                        else:
                            qt[tq] = _np.frombuffer(
                                body[i : i + 64], dtype=_np.uint8
                            ).astype(_np.int64)
                            i += 64
                elif marker == 0xDD:
                    ri = int.from_bytes(body[:2], "big")
                elif marker == 0xDA:
                    ns = body[0]
                    cur_scan = []
                    for si in range(ns):
                        cur_scan.append(
                            (
                                body[1 + 2 * si],
                                body[2 + 2 * si] >> 4,
                                body[2 + 2 * si] & 0x0F,
                            )
                        )
                    ss_ = body[1 + 2 * ns]
                    se_ = body[2 + 2 * ns]
                    ahal = body[3 + 2 * ns]
                    cur_spec = (ss_, se_, ahal >> 4, ahal & 0x0F)
                    cur_pos = p2 + 2 + seglen
                    break
                p2 += 2 + seglen
            if cur_scan is None:
                break

        # --- dequantize + IDCT the accumulated luma grid ---
        lqt = qt[lcomp[3]]
        deq = ycoef.astype(_np.float64) * lqt.astype(_np.float64)
        blocks = _np.zeros((BY, BX, 64), dtype=_np.float64)
        blocks[..., zigzag] = deq
        blocks = blocks.reshape(BY, BX, 8, 8)
        spatial = _np.einsum("xu,ijuv,vy->ijxy", _C.T, blocks, _C) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(BY * 8, BX * 8)
        comph = -(-h * lv // vmax)
        compw = -(-w * lh // hmax)
        out = _np.clip(_np.round(plane[:comph, :compw]), 0, 255)
        if lh != hmax or lv != vmax:
            out = out.repeat(vmax // lv, axis=0).repeat(hmax // lh, axis=1)
        return out[:h, :w].astype(_np.uint8)

    def decode(payload: bytes) -> "object":
        data = payload
        n = len(data)
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        pos = 2
        qt = {}
        huff = {}  # (class, id) -> dict[(len, code)] = symbol
        comps = None  # list of (id, hsamp, vsamp, qt_id)
        h = w = 0
        ri = 0
        scan = None
        spectral = (0, 63, 0, 0)  # Ss, Se, Ah, Al of the current scan
        progressive = False
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                break
            seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
            body = data[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0x0F
                    i += 1
                    if pq:
                        vals = _np.frombuffer(
                            body[i : i + 128], dtype=">u2"
                        ).astype(_np.int64)
                        i += 128
                    else:
                        vals = _np.frombuffer(
                            body[i : i + 64], dtype=_np.uint8
                        ).astype(_np.int64)
                        i += 64
                    qt[tq] = vals  # zigzag order
            elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(+ext sequential)
                prec = body[0]
                if prec != 8:
                    raise NotImplementedError(
                        f"JPEG precision {prec} unsupported (8-bit only)"
                    )
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                nc = body[5]
                comps = []
                for ci in range(nc):
                    cid = body[6 + 3 * ci]
                    hv = body[7 + 3 * ci]
                    comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * ci]))
            elif marker == 0xC2:  # SOF2: progressive DCT (huffman)
                prec = body[0]
                if prec != 8:
                    raise NotImplementedError(
                        f"JPEG precision {prec} unsupported (8-bit only)"
                    )
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                nc = body[5]
                comps = []
                for ci in range(nc):
                    cid = body[6 + 3 * ci]
                    hv = body[7 + 3 * ci]
                    comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * ci]))
                progressive = True
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "JPEG mode unsupported (baseline SOF0/SOF1 and "
                    f"progressive SOF2 only; got SOF marker 0xFF{marker:02X}"
                    " — arithmetic/lossless/hierarchical)"
                )
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0x0F
                    counts = body[i + 1 : i + 17]
                    i += 17
                    table = {}
                    code = 0
                    for ln in range(1, 17):
                        for _ in range(counts[ln - 1]):
                            table[(ln, code)] = body[i]
                            i += 1
                            code += 1
                        code <<= 1
                    huff[(tc, th)] = table
            elif marker == 0xDD:  # DRI
                ri = int.from_bytes(body[:2], "big")
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan = []
                for si in range(ns):
                    cid = body[1 + 2 * si]
                    tn = body[2 + 2 * si]
                    scan.append((cid, tn >> 4, tn & 0x0F))
                ss_, se_, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
                spectral = (ss_, se_, ahal >> 4, ahal & 0x0F)
                pos = pos + 2 + seglen
                break
            pos += 2 + seglen
        if comps is None or scan is None:
            raise ValueError("JPEG missing SOF/SOS")
        if progressive:
            return _progressive_decode(
                data, n, pos, comps, scan, spectral, qt, huff, ri, h, w
            )

        # Split entropy data into restart segments; unstuff FF00.
        segs = []
        cur = bytearray()
        i = pos
        while i < n:
            b = data[i]
            if b == 0xFF and i + 1 < n:
                m = data[i + 1]
                if m == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= m <= 0xD7:
                    segs.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
                break  # EOI or next marker
            cur.append(b)
            i += 1
        segs.append(bytes(cur))

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        # luma = first scan component
        ly_id = scan[0][0]
        lcomp = next(c for c in comps if c[0] == ly_id)
        lh, lv = lcomp[1], lcomp[2]
        lqt = qt[lcomp[3]]
        yplane = _np.zeros((mcuy * lv * 8, mcux * lh * 8), dtype=_np.float64)

        seg_i = 0
        buf = segs[0]
        bpos = 0  # bit position within buf
        blen = len(buf) * 8

        def read_bit() -> int:
            nonlocal bpos
            if bpos >= blen:
                return 0  # spec: pad with 1s; 0 keeps EOB behavior safe
            byte = buf[bpos >> 3]
            bit = (byte >> (7 - (bpos & 7))) & 1
            bpos += 1
            return bit

        def read_bits(t: int) -> int:
            v = 0
            for _ in range(t):
                v = (v << 1) | read_bit()
            return v

        def huffdec(table) -> int:
            code = 0
            for ln in range(1, 17):
                code = (code << 1) | read_bit()
                sym = table.get((ln, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid JPEG huffman code")

        def extend(v: int, t: int) -> int:
            return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

        # component order in the MCU follows the SCAN order
        scomps = []
        for cid, dct, act in scan:
            c = next(c for c in comps if c[0] == cid)
            scomps.append((cid, c[1], c[2], c[3], dct, act))

        preds = {cid: 0 for cid, *_ in scomps}
        mcu_n = 0
        ycoef = _np.zeros((mcuy, mcux, lv, lh, 64), dtype=_np.float64)
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and mcu_n and mcu_n % ri == 0:
                    seg_i += 1
                    if seg_i < len(segs):
                        buf = segs[seg_i]
                        bpos = 0
                        blen = len(buf) * 8
                    preds = {cid: 0 for cid, *_ in scomps}
                for cid, chh, cv, tq, dct, act in scomps:
                    dtab = huff[(0, dct)]
                    atab = huff[(1, act)]
                    for by in range(cv):
                        for bx in range(chh):
                            t = huffdec(dtab)
                            diff = extend(read_bits(t), t) if t else 0
                            preds[cid] += diff
                            is_y = cid == ly_id
                            if is_y:
                                zz = ycoef[my, mx, by, bx]
                                zz[0] = preds[cid]
                            k = 1
                            while k < 64:
                                rs = huffdec(atab)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("JPEG AC overflow")
                                v = extend(read_bits(s), s)
                                if is_y:
                                    zz[k] = v
                                k += 1
                mcu_n += 1

        # Dequantize + de-zigzag + IDCT all luma blocks at once.
        deq = ycoef * lqt.astype(_np.float64)
        blocks = _np.zeros((mcuy, mcux, lv, lh, 64), dtype=_np.float64)
        blocks[..., zigzag] = deq
        blocks = blocks.reshape(mcuy, mcux, lv, lh, 8, 8)
        spatial = _np.einsum("xu,...uv,vy->...xy", _C.T, blocks, _C) + 128.0
        # assemble plane: (mcuy, mcux, lv, lh, 8, 8) -> rows/cols
        sp = spatial.transpose(0, 2, 4, 1, 3, 5).reshape(
            mcuy * lv * 8, mcux * lh * 8
        )
        yplane[:, :] = sp
        comph = -(-h * lv // vmax)
        compw = -(-w * lh // hmax)
        out = _np.clip(_np.round(yplane[:comph, :compw]), 0, 255)
        if lh != hmax or lv != vmax:  # luma subsampled (rare): replicate
            out = out.repeat(vmax // lv, axis=0).repeat(hmax // lh, axis=1)
        return out[:h, :w].astype(_np.uint8)

    return decode


def decode_jpeg_luma(payload: bytes) -> np.ndarray:
    """Driver-side convenience wrapper (tests)."""
    return make_jpeg_decoder()(payload)
