"""Test-set decontamination: drop/flag training documents that contain any
k-token n-gram of a held-out evaluation set.

The standard benchmark-hygiene operator for LLM pretraining corpora
(13-gram overlap in GPT-3's appendix; we default k=8 to suit the short
fixture docs). Shape at 100 TB:

- The PROBE side (the eval set) is small by definition — benchmarks are
  MBs, the corpus is TBs. Its distinct k-grams are collected once on the
  driver, hashed, and broadcast via ``ray.put`` (a sorted uint64 array +
  the gram strings for exact verification).
- The TRAIN side streams: one Arrow regex split + ONE vectorized polars
  hash over the flattened token child array per batch, a k-step strided
  rolling polynomial over token hashes (no per-gram loop), row-boundary
  masking from the list offsets, and ``np.searchsorted`` membership
  against the broadcast probe hashes. Only the (rare) hash hits fall back
  to an exact gram-string check, so hash collisions can never flag a clean
  document — results are exact, bit-equal to the SQL n-gram equi-join
  oracle.

No reference analog (reference payloads are audit events); graft machinery
for the LLM-data pipeline axis, same token conventions as stages/text.py.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .text import _token_lists

K_DEFAULT = 8
_B = np.uint64(1_000_003)  # rolling polynomial base (uint64 wrap-around)


def _roll_gram_hashes(tok_hash: np.ndarray, k: int) -> np.ndarray:
    """hash of every k-run of consecutive token hashes — k strided adds."""
    m = len(tok_hash) - k + 1
    if m <= 0:
        return np.empty(0, np.uint64)
    g = np.zeros(m, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            g = g * _B + tok_hash[i : i + m]
    return g


def _hash_tokens(flat: pa.Array) -> np.ndarray:
    import polars as pl

    if len(flat) == 0:
        return np.empty(0, np.uint64)
    return pl.from_arrow(flat).hash(seed=0).to_numpy().astype(np.uint64)


def probe_grams_batch(batch: pa.Table, *, text_col: str = "text", k: int = K_DEFAULT) -> pa.Table:
    """Per-batch DISTINCT k-gram strings of the probe (eval) docs. The probe
    side is small; a per-row Python window join is fine here."""
    grams: set[str] = set()
    for t in batch[text_col].to_pylist():
        if not t:
            continue
        toks = re.split(r"\s+", t.strip())
        grams.update(" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1))
    return pa.table({"gram": pa.array(sorted(grams), pa.string())})


def build_probe_set(probe_ds, *, text_col: str = "text", k: int = K_DEFAULT):
    """Collect the eval set's distinct k-grams and broadcast them.

    Returns ``(probe_ref, n_grams)`` where ``probe_ref`` is a ``ray.put``
    handle to ``(sorted_hashes, frozenset_of_grams)``. Driver-side
    collection is deliberate: the probe side is the SMALL side (eval
    benchmarks), never the corpus — do not point this at the training set.
    """
    import ray

    parts = probe_ds.map_batches(
        probe_grams_batch, fn_kwargs=dict(text_col=text_col, k=k), batch_format="pyarrow"
    )
    grams: set[str] = set()
    for row in parts.take_all():
        grams.add(row["gram"])
    gram_list = sorted(grams)
    # hash each gram's TOKENS with the same rolling scheme the train side
    # uses, so membership tests compare like with like
    hashes = np.empty(len(gram_list), np.uint64)
    for i, g in enumerate(gram_list):
        th = _hash_tokens(pa.array(g.split(" "), pa.string()))
        hashes[i] = _roll_gram_hashes(th, k)[0] if len(th) >= k else np.uint64(0)
    return ray.put((np.sort(np.unique(hashes)), frozenset(gram_list))), len(gram_list)


def mark_contaminated(
    train_ds,
    probe_ref,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_DEFAULT,
    drop_clean: bool = False,
):
    """Stream the training corpus; emit ``(id, n_contaminated)`` per doc —
    the count of gram-positions whose k-gram appears in the probe set
    (0 = clean). ``drop_clean=True`` keeps only contaminated docs (the
    filter feeding an actual drop step)."""
    import ray

    def check(batch: pa.Table) -> pa.Table:
        sorted_hashes, probe_set = ray.get(probe_ref)  # local after first fetch
        toks = _token_lists(batch[text_col])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        counts = np.zeros(batch.num_rows, np.int64)
        g = _roll_gram_hashes(_hash_tokens(flat), k)
        if len(g) and len(sorted_hashes):
            pos = np.arange(len(g), dtype=np.int64)
            rowid = np.searchsorted(offsets, pos, side="right") - 1
            valid = pos + k <= offsets[rowid + 1]  # gram must not straddle rows
            idx = np.clip(np.searchsorted(sorted_hashes, g), 0, len(sorted_hashes) - 1)
            hit = valid & (sorted_hashes[idx] == g)
            hitpos = np.flatnonzero(hit)
            if len(hitpos):
                flat_py = flat.to_pylist()  # only on batches with candidates
                for p in hitpos:
                    if " ".join(flat_py[p : p + k]) in probe_set:  # exact verify
                        counts[rowid[p]] += 1
        out = pa.table(
            {id_col: batch[id_col], "n_contaminated": pa.array(counts, pa.int64())}
        )
        return out.filter(pa.array(counts > 0)) if drop_clean else out

    return train_ds.map_batches(check, batch_format="pyarrow")
