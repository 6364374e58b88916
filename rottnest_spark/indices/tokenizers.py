"""Pluggable tokenizers for the BM25 index — closing the X2 gap.

The reference serializes a HuggingFace tokenizer into the index header and
requires the probe-side tokenizer to match the build
(src/lava/tokenizer_utils.rs:14-80, 48-54). This module supplies the same
contract Spark-side:

- a `Tokenizer` has an `ident` string recorded in the catalog config, so a
  probe with a different tokenizer fails the existing config guard loudly
  (never silently under-matches);
- `tokens_col(col)` produces the token array as a Column — JVM codegen for
  the regex default, an Arrow-batched pandas UDF for WordPiece (the
  reference's HF tokenizer runs row-at-a-time Rust; a vectorized UDF is the
  Spark-correct shape for tokenization that built-ins can't express);
- `tokenize(s)` is the driver-side twin used for query strings.

`WordPieceTokenizer` implements the BERT wordpiece algorithm from the
public BERT reference implementation (greedy longest-match-first over a
vocab, `##` continuation prefix, per-word [UNK] fallback, basic
lowercase + punctuation-splitting pre-tokenization). Given the
`bert-base-uncased` vocab.txt it reproduces the reference's tokenization
without any model library; the container ships no vocab, so tests use toy
vocabs — the algorithm, config plumbing and exactness machinery are fully
real, only the vocab file is deployment-supplied.

The tokenizer affects SCORES AND STATS only, never exactness: BM25's
candidate set is "units containing >= 1 query token" *under the build
tokenizer*, and the refine rescoring uses the same tokenizer, so top-K
remains exact for any Tokenizer (the same argument as the embedder swap
contract, tests/test_embedder_contract.py)."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F


class Tokenizer:
    """Interface. `ident` must uniquely identify tokenization behavior —
    it is the config value the probe/build match is enforced on."""

    ident: str = "abstract"

    def tokens_col(self, col):
        """array<string> Column of the tokens of a string column (build,
        refine and in-situ scoring all use this — one definition)."""
        raise NotImplementedError

    def tokenize(self, s: str) -> list[str]:
        """Driver-side tokenization of a query string. Must agree with
        tokens_col on every input."""
        raise NotImplementedError

    def query_tokens(self, s: str) -> list[str]:
        """Distinct sorted tokens of a query (probe form)."""
        return sorted(set(self.tokenize(s)))


class RegexTokenizer(Tokenizer):
    """The default: lowercase, split on runs of [^a-z0-9]. Pure JVM codegen
    (split/filter), and exactly replicable in ANSI SQL — which is what lets
    the DuckDB oracle reproduce BM25 scores bit-for-bit."""

    def __init__(self, split_re: str = "[^a-z0-9]+"):
        self.split_re = split_re
        self.ident = f"regex:{split_re}"

    def tokens_col(self, col):
        return F.filter(
            F.split(F.lower(col), self.split_re), lambda t: t != F.lit("")
        )

    def tokenize(self, s: str) -> list[str]:
        import re

        return [t for t in re.split(self.split_re, s.lower()) if t]


def _wordpiece_word(
    word: str, vocab: frozenset, max_chars: int, unk: str, prefix: str = "##"
):
    """Greedy longest-match-first wordpiece of ONE pre-tokenized word —
    the public BERT algorithm: repeatedly take the longest vocab entry
    that prefixes the remainder (continuations carry the subword prefix,
    '##' for BERT); any miss makes the whole word [UNK]."""
    if len(word) > max_chars:
        return [unk]
    pieces, start = [], 0
    while start < len(word):
        end, cur = len(word), None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = prefix + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk]
        pieces.append(cur)
        start = end
    return pieces


def _basic_pretokenize(text: str) -> list[str]:
    """BERT basic tokenizer, uncased: lowercase, then split on whitespace
    with every punctuation character becoming its own token."""
    import unicodedata

    out: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            out.append("".join(cur))
            cur.clear()

    for ch in text.lower():
        cat = unicodedata.category(ch)
        if ch.isspace():
            flush()
        elif cat.startswith("P"):
            flush()
            out.append(ch)
        else:
            cur.append(ch)
    flush()
    return out


class WordPieceTokenizer(Tokenizer):
    """BERT-style wordpiece over a deployment-supplied vocabulary.

    `vocab` is a list of wordpiece entries (the lines of a vocab.txt —
    order irrelevant here since we never need token ids), a path to a
    vocab.txt, or a path to a serialized HF fast tokenizer
    (`tokenizer.json`, the more common export — the artifact the
    reference accepts, src/lava/tokenizer_utils.rs:14-80): its
    ``model.vocab`` map supplies the entries and ``model.unk_token`` /
    ``model.continuing_subword_prefix`` /
    ``model.max_input_chars_per_word`` override the wordpiece knobs.
    The ident embeds an md5 of the sorted vocab (plus any non-default
    knobs), so two indexes built from different vocab files — or the same
    vocab under different wordpiece parameters — can never be probed
    interchangeably."""

    def __init__(
        self,
        vocab,
        unk_token: str = "[UNK]",
        max_chars: int = 200,
        cont_prefix: str = "##",
    ):
        # the source path (when given one) is recorded so the catalog can
        # round-trip the tokenizer: BM25Index.config() persists it and
        # index_from_config reloads the vocab at maintenance time
        # (mirrors the reference's tokenizer-artifact workflow,
        # src/lava/tokenizer_utils.rs:14-80)
        self.vocab_path = vocab if isinstance(vocab, str) else None
        if isinstance(vocab, str):
            if vocab.endswith(".json"):
                vocab, unk_token, max_chars, cont_prefix = (
                    self._parse_tokenizer_json(vocab)
                )
            else:
                with open(vocab) as fh:
                    vocab = [ln.strip() for ln in fh if ln.strip()]
        self._vocab = frozenset(vocab)
        self.unk_token = unk_token
        self.max_chars = max_chars
        self.cont_prefix = cont_prefix
        hashed = "\n".join(sorted(self._vocab))
        if (unk_token, max_chars, cont_prefix) != ("[UNK]", 200, "##"):
            # appended ONLY when non-default so pre-existing catalog
            # idents (vocab-only hash) remain valid
            hashed += f"\x00unk={unk_token}|max={max_chars}|cont={cont_prefix}"
        digest = hashlib.md5(hashed.encode()).hexdigest()[:16]
        self.ident = f"wordpiece:{digest}"

    @staticmethod
    def _parse_tokenizer_json(path: str):
        """(vocab_entries, unk, max_chars, cont_prefix) from a serialized
        HF fast tokenizer. Only WordPiece models are loadable — a BPE/
        Unigram tokenizer.json must refuse loudly, not mis-tokenize."""
        import json

        with open(path) as fh:
            doc = json.load(fh)
        model = doc.get("model") or {}
        mtype = model.get("type", "WordPiece")
        if mtype != "WordPiece":
            raise ValueError(
                f"{path}: tokenizer.json model type is {mtype!r} — only "
                "WordPiece models load into WordPieceTokenizer"
            )
        vocab_map = model.get("vocab")
        if not isinstance(vocab_map, dict) or not vocab_map:
            raise ValueError(f"{path}: model.vocab map missing or empty")
        return (
            list(vocab_map),
            model.get("unk_token", "[UNK]"),
            int(model.get("max_input_chars_per_word", 100)),
            model.get("continuing_subword_prefix", "##"),
        )

    def tokenize(self, s: str) -> list[str]:
        vocab, mc, unk = self._vocab, self.max_chars, self.unk_token
        out: list[str] = []
        for w in _basic_pretokenize(s):
            out.extend(_wordpiece_word(w, vocab, mc, unk, self.cont_prefix))
        return out

    def tokens_col(self, col):
        """Arrow-batched pandas UDF. The vocab and the wordpiece routine
        are captured by value in the closure (repo convention: executors
        may not have the package importable), so the UDF is fully
        self-contained."""
        from pyspark.sql.functions import pandas_udf

        vocab, mc, unk = self._vocab, self.max_chars, self.unk_token
        prefix = self.cont_prefix

        def wp_word(word):
            if len(word) > mc:
                return [unk]
            pieces, start = [], 0
            while start < len(word):
                end, cur = len(word), None
                while start < end:
                    sub = word[start:end]
                    if start > 0:
                        sub = prefix + sub
                    if sub in vocab:
                        cur = sub
                        break
                    end -= 1
                if cur is None:
                    return [unk]
                pieces.append(cur)
                start = end
            return pieces

        @pandas_udf("array<string>")
        def wp(series: pd.Series) -> pd.Series:
            import unicodedata

            def pretok(text):
                out, cur = [], []
                for ch in text.lower():
                    if ch.isspace():
                        if cur:
                            out.append("".join(cur))
                            cur = []
                    elif unicodedata.category(ch).startswith("P"):
                        if cur:
                            out.append("".join(cur))
                            cur = []
                        out.append(ch)
                    else:
                        cur.append(ch)
                if cur:
                    out.append("".join(cur))
                return out

            def tok(text):
                if text is None:
                    return []
                out = []
                for w in pretok(text):
                    out.extend(wp_word(w))
                return out

            return series.map(tok)

        return wp(col if not isinstance(col, str) else F.col(col))


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→printable-unicode map (the public
    encoder.py algorithm, restated): printable latin bytes map to
    themselves; the rest shift into 256+ codepoints so every byte string
    becomes a lossless str the BPE merge table can address."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


#: GPT-2 pretokenizer pattern, stdlib-`re` transliteration: \p{L} becomes
#: [^\W\d_] and \p{N} becomes \d (both unicode-aware in Python). Nl/No
#: numerals and some edge scripts classify slightly differently than the
#: `regex` module's \p classes — irrelevant for exactness because build
#: and probe share the SAME pattern (module docstring contract).
_GPT2_PAT = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+(?!\S)|\s+"
)


def _bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Merge-by-lowest-rank BPE over one pretoken (already byte-mapped).
    The standard algorithm: repeatedly merge the adjacent pair with the
    smallest merge rank until none remain."""
    parts = list(word)
    while len(parts) > 1:
        best, best_rank = None, None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        parts[best : best + 2] = [parts[best] + parts[best + 1]]
    return parts


class BPETokenizer(Tokenizer):
    """Byte-level BPE from a serialized HF fast tokenizer
    (`tokenizer.json` with model.type == "BPE" — the GPT-2/RoBERTa/Llama
    family), the other common artifact the reference's tokenizer loader
    accepts (src/lava/tokenizer_utils.rs:14-80). Pure-python: the GPT-2
    byte→unicode map, the GPT-2 pretokenizer regex, and rank-ordered
    merges from model.merges. Case-SENSITIVE (byte-level BPE has no
    lowercase step); tokens are the mapped-unicode merge strings, which
    only need to be build/probe-consistent for BM25 exactness.

    Only ByteLevel pre_tokenizers load — a Metaspace/Whitespace BPE
    would mis-tokenize silently, so it refuses loudly instead."""

    def __init__(self, path: str):
        import json

        self.vocab_path = path
        with open(path) as fh:
            doc = json.load(fh)
        model = doc.get("model") or {}
        if model.get("type") != "BPE":
            raise ValueError(
                f"{path}: tokenizer.json model type is "
                f"{model.get('type')!r} — BPETokenizer loads BPE models "
                "(WordPiece loads via WordPieceTokenizer)"
            )
        pre = doc.get("pre_tokenizer") or {}
        kinds = [pre.get("type")] + [
            p.get("type") for p in pre.get("pretokenizers", [])
        ]
        if "ByteLevel" not in kinds:
            raise ValueError(
                f"{path}: pre_tokenizer {kinds} is not ByteLevel — only "
                "byte-level BPE is supported (GPT-2 family); other "
                "pre-tokenizers would silently mis-tokenize"
            )
        merges = model.get("merges") or []
        if not merges:
            raise ValueError(f"{path}: model.merges missing or empty")
        pairs = [
            tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m)
            for m in merges
        ]
        self._ranks = {p: i for i, p in enumerate(pairs)}
        self._vocab = frozenset(model.get("vocab") or [])
        self._byte_map = _bytes_to_unicode()
        hashed = "\n".join(f"{a}\x01{b}" for a, b in pairs)
        hashed += "\x00" + "\n".join(sorted(self._vocab))
        digest = hashlib.md5(hashed.encode()).hexdigest()[:16]
        self.ident = f"bpe:{digest}"

    def tokenize(self, s: str) -> list[str]:
        import re as _re

        bm, ranks = self._byte_map, self._ranks
        out: list[str] = []
        for pretok in _re.findall(_GPT2_PAT, s):
            mapped = "".join(bm[b] for b in pretok.encode("utf-8"))
            out.extend(_bpe_word(mapped, ranks))
        return out

    def tokens_col(self, col):
        """Arrow-batched pandas UDF; the byte map, merge ranks, and the
        merge routine are captured by value in the closure (repo
        convention: executors may not have the package importable)."""
        from pyspark.sql.functions import pandas_udf

        bm, ranks, pat = self._byte_map, self._ranks, _GPT2_PAT

        @pandas_udf("array<string>")
        def bpe(series: pd.Series) -> pd.Series:
            import re as _re

            rx = _re.compile(pat)

            def bpe_word(word):
                parts = list(word)
                while len(parts) > 1:
                    best, best_rank = None, None
                    for i in range(len(parts) - 1):
                        r = ranks.get((parts[i], parts[i + 1]))
                        if r is not None and (
                            best_rank is None or r < best_rank
                        ):
                            best, best_rank = i, r
                    if best is None:
                        break
                    parts[best : best + 2] = [
                        parts[best] + parts[best + 1]
                    ]
                return parts

            def tok(text):
                if text is None:
                    return []
                out = []
                for pretok in rx.findall(text):
                    mapped = "".join(bm[b] for b in pretok.encode("utf-8"))
                    out.extend(bpe_word(mapped))
                return out

            return series.map(tok)

        return bpe(col if not isinstance(col, str) else F.col(col))


def tokenizer_from_json(path: str) -> Tokenizer:
    """Load a serialized HF fast tokenizer (`tokenizer.json`) into the
    matching Tokenizer by model.type — the one-call artifact on-ramp the
    reference provides (src/lava/tokenizer_utils.rs:14-80): WordPiece →
    WordPieceTokenizer, BPE → BPETokenizer. Anything else refuses loudly
    (a Unigram model silently mis-tokenized would corrupt the index)."""
    import json

    with open(path) as fh:
        mtype = (json.load(fh).get("model") or {}).get("type")
    if mtype == "WordPiece":
        return WordPieceTokenizer(path)
    if mtype == "BPE":
        return BPETokenizer(path)
    raise ValueError(
        f"{path}: unsupported tokenizer.json model type {mtype!r} — "
        "WordPiece and byte-level BPE load; others would mis-tokenize"
    )
