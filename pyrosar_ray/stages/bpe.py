"""Distributed BPE: sampled training + broadcast-merge encoding.

The LLM-tokenizer pipeline over the documents table, Ray-Data-first:

1. **Word-frequency reduction** (distributed): per-batch
   ``value_counts`` partials → one vocabulary-sized ``groupby(word).Sum``
   → ``sort desc``/``limit(max_vocab)``. Only the bounded top-``V``
   word table ever reaches the driver — the corpus itself never does,
   and the exchange carries (word, n) rows, not occurrences.
2. **Merge training** (driver, bounded): the Sennrich merge loop over
   that table (functions/bpe.train_bpe). BPE training is inherently
   sequential in the merge list; running it on the bounded word table
   is the standard formulation (HuggingFace tokenizers does the same) —
   at 100 TB the reduction output is still ~vocab-sized.
3. **Encoding** (distributed): merge ranks go to the object store ONCE
   (``ray.put``) and an actor pool segments every document, one
   word-level LRU cache per actor (Zipf makes the hit rate ~99%).

``recon_ok`` asserts ``''.join(tokens) == word + '</w>'`` per word —
the segmentation is a partition of the input, so any merge-order bug
flips a visible boolean rather than silently shifting counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions.bpe import EOW, encode_word, train_bpe


def learn_merges(
    docs: Dataset,
    n_merges: int = 200,
    max_vocab: int = 20_000,
    sample_mod: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Train a merge list from the corpus (or the ``doc_id % sample_mod
    == 0`` sample) via the bounded word-frequency reduction."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        if sample_mod > 1:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(ids % sample_mod == 0))
        s = batch[text_col].to_pandas().astype("string")
        counts = s.str.split(" ").explode().dropna().value_counts(sort=False)
        counts = counts[counts.index.str.len() > 0]
        return pa.table(
            {
                "word": pa.array(counts.index.to_numpy(), type=pa.string()),
                "n": pa.array(counts.to_numpy().astype(np.int64)),
            }
        )

    table = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(max_vocab)
        .to_pandas()
    )
    word_counts = dict(zip(table["word"], table["n"].astype(int)))
    return train_bpe(word_counts, n_merges)


class BpeEncoder:
    """Actor-pool stage: segment each document with broadcast ranks."""

    def __init__(self, ranks_ref):
        import ray

        self._ranks = ray.get(ranks_ref)
        self._cache: dict[str, tuple[str, ...]] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n_tokens, n_words, ok = [], [], []
        for t in texts:
            words = [w for w in t.split(" ") if w]
            total = 0
            good = True
            for w in words:
                toks = encode_word(w, self._ranks, self._cache)
                total += len(toks)
                if "".join(toks) != w + EOW:
                    good = False
            n_tokens.append(total)
            n_words.append(len(words))
            ok.append(good)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_words": pa.array(n_words, type=pa.int64()),
                "n_bpe_tokens": pa.array(n_tokens, type=pa.int64()),
                "recon_ok": pa.array(ok, type=pa.bool_()),
            }
        )


def bpe_encode(
    docs: Dataset,
    merges: list[tuple[str, str]],
    concurrency=(1, 8),
    batch_size: int = 256,
) -> Dataset:
    """Per-document subword counts under a trained merge table."""
    import ray

    ranks_ref = ray.put({p: i for i, p in enumerate(merges)})
    return docs.map_batches(
        BpeEncoder,
        fn_constructor_args=(ranks_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
