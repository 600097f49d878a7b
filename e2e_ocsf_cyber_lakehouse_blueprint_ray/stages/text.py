"""Text-analysis operators for training-data pipelines.

Not present in the reference (its payloads are audit events); these are the
large-scale text-pipeline operators the graft adds as first-class components:
language-ID (marker-word heuristic), quality scoring (length / word /
stopword-ratio), token counting (whitespace regex), document fingerprinting
(content hash + winnowing rolling-hash sketch).

All are stateless vectorized ``map_batches`` functions except the winnowing
sketch, whose per-row loop runs over a few hundred tokens per document (and
is still batched). The list-column trick used throughout: split to an Arrow
list array, flatten, apply a vectorized kernel to the flat child, and reduce
back per row with ``np.add.reduceat`` over the list offsets — no Python per
row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT = r"\s+"

#: marker words per language for the n-gram/stopword heuristic. Must stay in
#: sync with the oracle SQL in pipelines/queries.py (same lists, same
#: tie-break order).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "los", "las", "es", "y", "un", "una"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]

STOPWORDS = LANG_MARKERS["en"]


def _token_lists(text: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    out = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), TOKEN_SPLIT)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _per_row_membership_counts(tokens: pa.ListArray, vocab: list[str]) -> np.ndarray:
    """count of tokens ∈ vocab per row — flatten + is_in + reduceat."""
    offsets = tokens.offsets.to_numpy(zero_copy_only=False)
    flat = tokens.flatten()
    if len(flat) == 0:
        return np.zeros(len(tokens), dtype=np.int64)
    hits = pc.is_in(flat, value_set=pa.array(vocab)).to_numpy(zero_copy_only=False)
    hits = np.where(hits, 1, 0).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(hits)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def _set_col(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.schema.names:
        return batch.set_column(batch.schema.get_field_index(name), name, arr)
    return batch.append_column(name, arr)


def token_count(batch: pa.Table, *, text_col: str = "text", out_col: str = "n_tokens") -> pa.Table:
    toks = _token_lists(batch[text_col])
    return _set_col(batch, out_col, pc.cast(pc.list_value_length(toks), pa.int64()))


#: BPE-ish pre-tokenizer pattern (letters / digits / single punctuation) —
#: both pyarrow and DuckDB run RE2, so match counts agree exactly.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(batch: pa.Table, *, text_col: str = "text", out_col: str = "n_bpe_tokens") -> pa.Table:
    """Token count under a BPE-style pre-tokenization regex — one vectorized
    non-overlapping match count per row (pc.count_substring_regex)."""
    n = pc.count_substring_regex(batch[text_col], BPE_PATTERN)
    return _set_col(batch, out_col, pc.cast(n, pa.int64()))


def quality_score(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """n_chars, n_words, stop_ratio — the classic cheap quality features."""
    text = batch[text_col]
    toks = _token_lists(text)
    n_words = pc.cast(pc.list_value_length(toks), pa.int64())
    stop_hits = _per_row_membership_counts(toks, STOPWORDS)
    nw = n_words.to_numpy(zero_copy_only=False).astype(np.float64)
    stop_ratio = stop_hits / np.maximum(nw, 1.0)
    out = _set_col(batch, "n_chars", pc.cast(pc.utf8_length(text), pa.int64()))
    out = _set_col(out, "n_words", n_words)
    return _set_col(out, "stop_ratio", pa.array(stop_ratio, pa.float64()))


def lang_id(batch: pa.Table, *, text_col: str = "text", out_col: str = "pred_lang") -> pa.Table:
    """Marker-word language ID; cascade tie-break in LANG_ORDER (must match
    the oracle SQL's CASE chain exactly)."""
    toks = _token_lists(batch[text_col])
    counts = np.stack(
        [_per_row_membership_counts(toks, LANG_MARKERS[lg]) for lg in LANG_ORDER]
    )  # (L, n)
    n = counts.shape[1]
    pred = np.full(n, "und", dtype=object)
    assigned = np.zeros(n, dtype=bool)
    any_hit = counts.sum(axis=0) > 0
    for i, lg in enumerate(LANG_ORDER):
        ge_all = np.ones(n, dtype=bool)
        for j in range(len(LANG_ORDER)):
            ge_all &= counts[i] >= counts[j]
        take = ge_all & ~assigned & any_hit
        pred[take] = lg
        assigned |= take
    return batch.append_column(out_col, pa.array(pred, pa.string()))


#: PII scrub patterns (RE2 — identical semantics in pyarrow and DuckDB).
#: Emails first (they contain digit runs), then long digit runs
#: (account/phone-number shaped).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_DIGITS = r"[0-9]{6,}"


def scrub_pii(batch: pa.Table, *, text_col: str = "text", out_col: str = "scrubbed") -> pa.Table:
    """Rule-based PII scrubbing (training-data hygiene op): redact emails and
    long digit runs, count redactions. Fully vectorized —
    ``pc.count_substring_regex`` + two ``pc.replace_substring_regex`` passes."""
    text = batch[text_col]
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    n_email = pc.count_substring_regex(text, PII_EMAIL)
    step1 = pc.replace_substring_regex(text, PII_EMAIL, "<EMAIL>")
    n_digit = pc.count_substring_regex(step1, PII_DIGITS)
    scrubbed = pc.replace_substring_regex(step1, PII_DIGITS, "<NUM>")
    out = _set_col(batch, out_col, scrubbed)
    return _set_col(
        out, "n_redactions", pc.cast(pc.add(n_email, n_digit), pa.int64())
    )


def fingerprint_md5(batch: pa.Table, *, text_col: str = "text", out_col: str = "fp_md5") -> pa.Table:
    """Content fingerprint = md5 hex (oracle: DuckDB ``md5(text)``)."""
    vals = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out_col, pa.array(vals, pa.string()))


def repetition_stats(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Intra-document repetition features (boilerplate / TTR detection):
    per doc, total tokens, distinct tokens, the most-frequent token's count
    and its fraction of the doc. Vectorized end-to-end: flatten the token
    lists, one in-batch Arrow ``group_by([row, token])`` then a second
    ``group_by(row)`` for sum/count/max — both C++ hash aggregates, no
    Python per row. Purely per-row features → no shuffle ever."""
    toks = _token_lists(batch[text_col])
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    n_rows = batch.num_rows
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
    n_tokens = np.zeros(n_rows, np.int64)
    n_distinct = np.zeros(n_rows, np.int64)
    top_count = np.zeros(n_rows, np.int64)
    if len(flat):
        per_tok = pa.table({"r": pa.array(row_ids), "tok": flat}).group_by(
            ["r", "tok"]
        ).aggregate([("tok", "count")])
        per_row = per_tok.group_by("r").aggregate(
            [("tok_count", "sum"), ("tok_count", "count"), ("tok_count", "max")]
        )
        r = per_row["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tokens[r] = per_row["tok_count_sum"].to_numpy(zero_copy_only=False)
        n_distinct[r] = per_row["tok_count_count"].to_numpy(zero_copy_only=False)
        top_count[r] = per_row["tok_count_max"].to_numpy(zero_copy_only=False)
    top_frac = top_count / np.maximum(n_tokens, 1)  # per-row double: bit-stable
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "top_count": pa.array(top_count, pa.int64()),
            "top_frac": pa.array(top_frac, pa.float64()),
        }
    )


def token_partial_counts(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Per-batch partial token frequencies — the combiner half of a global
    word count. Flatten the whitespace-token lists and ``value_counts`` them
    INSIDE the batch, so the downstream ``groupby("token").sum("n")``
    shuffle moves one row per distinct token per batch (vocabulary-sized),
    not one per token occurrence (corpus-sized)."""
    toks = _token_lists(batch[text_col])
    flat = toks.flatten()
    if len(flat) == 0:
        return pa.table({"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    vc = flat.value_counts()  # StructArray<values, counts>
    return pa.table(
        {
            "token": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        }
    )


def sequence_chunks(
    batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id", capacity: int = 32
) -> pa.Table:
    """Sequence chunker for training-data prep: split each document into
    ``ceil(n_tokens / capacity)`` chunks of ≤ ``capacity`` whitespace tokens,
    emitting (doc_id, chunk_idx, n_chunk_tokens). Fully vectorized
    (np.repeat + per-doc aranges); docs never straddle chunk boundaries."""
    toks = _token_lists(batch[text_col])
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chunks = np.maximum((n + capacity - 1) // capacity, 1)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    rep_ids = np.repeat(ids, n_chunks)
    total = int(n_chunks.sum())
    # chunk_idx: concatenated aranges per doc
    starts = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, n_chunks)
    last = np.repeat(n - (n_chunks - 1) * capacity, n_chunks)  # size of final chunk
    is_last = chunk_idx == np.repeat(n_chunks - 1, n_chunks)
    sizes = np.where(is_last, last, capacity)
    return pa.table(
        {
            id_col: pa.array(rep_ids, pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_chunk_tokens": pa.array(sizes, pa.int64()),
        }
    )


def mixture_sample(
    batch: pa.Table,
    *,
    weights: dict[str, float],
    group_col: str = "source",
    text_col: str = "text",
) -> pa.Table:
    """Weighted mixture sampling for dataset blending: keep each row with
    its group's probability, decided by the md5 prefix of the CONTENT (not a
    RNG) — deterministic, partition/cluster-size invariant, and
    engine-independent (mirrors a DuckDB CASE over
    ``substr(md5(text),1,4)``). Unknown groups get weight 0."""
    cuts = {g: (int(w * 0x10000)) for g, w in weights.items()}
    groups = batch[group_col].to_pylist()
    keep = [
        t is not None
        and int(hashlib.md5(t.encode("utf-8")).hexdigest()[:4], 16) < cuts.get(g, 0)
        for g, t in zip(groups, batch[text_col].to_pylist())
    ]
    return batch.filter(pa.array(keep, pa.bool_()))


def hash_sample(batch: pa.Table, *, text_col: str = "text", pct: int = 10) -> pa.Table:
    """Deterministic content-hash sampling for training-data curation: keep
    a row iff the first 4 hex chars of md5(text) fall in the lowest ``pct``%
    of the 16-bit space. Engine-independent (mirrors DuckDB
    ``substr(md5(text),1,4) < '<hex cut>'``), stable across runs and
    partitionings — re-sampling the same corpus always selects the same
    documents, which is what makes incremental re-curation reproducible."""
    cut = (pct * 0x10000) // 100
    keep = [
        t is not None and int(hashlib.md5(t.encode("utf-8")).hexdigest()[:4], 16) < cut
        for t in batch[text_col].to_pylist()
    ]
    return batch.filter(pa.array(keep, pa.bool_()))


_FP_MOD = np.uint64((1 << 61) - 1)
_FP_BASE = np.uint64(1_000_003)


def winnow_fingerprint(
    batch: pa.Table, *, text_col: str = "text", k: int = 5, window: int = 4, out_col: str = "fp_winnow"
) -> pa.Table:
    """Winnowing document sketch (Schleimer et al., SIGMOD'03 idea): rolling
    polynomial hash over k-token grams, min per sliding window, distinct
    mins sorted → stable int64 digest of the sketch."""
    toks = _token_lists(batch[text_col])
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    flat = toks.flatten().to_pylist()
    tok_h = np.fromiter(
        (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little") for t in flat),
        dtype=np.uint64,
        count=len(flat),
    )
    out = np.zeros(len(toks), dtype=np.int64)
    for r in range(len(toks)):
        h = tok_h[offsets[r] : offsets[r + 1]]
        if len(h) == 0:
            continue
        if len(h) < k:
            grams = np.array([h.astype(np.uint64).sum() % _FP_MOD], dtype=np.uint64)
        else:
            # vectorized k-gram polynomial hash (k strided adds over the
            # whole row, no per-gram loop)
            m = len(h) - k + 1
            grams = np.zeros(m, dtype=np.uint64)
            for i in range(k):
                grams = (grams * _FP_BASE + h[i : i + m]) % _FP_MOD
        if len(grams) >= window:
            idx = np.arange(len(grams) - window + 1)[:, None] + np.arange(window)
            mins = grams[idx].min(axis=1)
        else:
            mins = grams.min(keepdims=True)
        sketch = np.unique(mins)
        digest = np.uint64(0)
        with np.errstate(over="ignore"):  # uint64 wrap is the intended mix
            for v in sketch:
                digest = (digest * _FP_BASE + v) % _FP_MOD
        out[r] = np.int64(digest)
    return batch.append_column(out_col, pa.array(out, pa.int64()))
