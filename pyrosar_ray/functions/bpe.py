"""Byte-pair-encoding tokenizer: trainer + word segmenter, pure Python.

The real-subword leg of the token surface (``stages/text.token_stats``
keeps the whitespace/DuckDB-parity law; this module adds the
Sennrich-et-al-2016 merge grammar used by actual LLM tokenizers).
Everything is deterministic: merge selection breaks frequency ties
lexicographically, so two trainings over the same counts produce the
identical merge list — the property the distributed pipeline's
broadcast step relies on.

Training operates on a WORD-FREQUENCY table, not the corpus: the
distributed stage (stages/bpe.py) reduces the corpus to ``(word, n)``
via partial counts + one vocabulary-sized groupby, and the driver-side
merge loop touches only that bounded table (standard practice — BPE
trainers run on word counts; HuggingFace tokenizers does the same).

Segmentation: a word is the character tuple ``(c0, c1, ..., ck</w>)``
(end-of-word marker fused onto the last character, the original
Sennrich formulation) and merges apply lowest-rank-first, left-to-right
on rank ties.
"""

from __future__ import annotations

EOW = "</w>"


def word_symbols(word: str) -> tuple[str, ...]:
    """'low' → ('l', 'o', 'w</w>')."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] += EOW
    return tuple(chars)


def train_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a word-frequency table.

    Classic agglomerative loop with an incrementally-maintained pair
    index: only words CONTAINING the merged pair are re-segmented per
    round, so a round costs O(words-with-pair), not O(vocab). Stops
    early when no pair occurs twice.
    """
    vocab: list[tuple[str, ...]] = []
    counts: list[int] = []
    for w, n in sorted(word_counts.items()):
        syms = word_symbols(w)
        if len(syms) >= 2:
            vocab.append(syms)
            counts.append(n)

    pair_freq: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(vocab):
        n = counts[wi]
        for a, b in zip(syms, syms[1:]):
            pair_freq[(a, b)] = pair_freq.get((a, b), 0) + n
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        best_n = 1
        for p, n in pair_freq.items():
            if n > best_n or (n == best_n and (best is None or p < best)):
                best, best_n = p, n
        if best is None or best_n < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = vocab[wi]
            n = counts[wi]
            # remove old pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] -= n
                if pair_freq[(a, b)] <= 0:
                    del pair_freq[(a, b)]
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[(a, b)]
            new = _merge_word(syms, best, merged)
            vocab[wi] = new
            for a, b in zip(new, new[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + n
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str], merged: str) -> tuple[str, ...]:
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> tuple[str, ...]:
    """Segment one word with a trained merge table (lowest rank first,
    leftmost occurrence on equal pairs — the standard BPE apply order).

    ``cache`` memoizes word → tokens; under Zipfian text the hit rate
    makes the amortized cost per token near-constant (the actor-pool
    stage owns one cache per worker).
    """
    if cache is not None:
        hit = cache.get(word)
        if hit is not None:
            return hit
    syms = word_symbols(word)
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair, best_pair[0] + best_pair[1])
    if cache is not None:
        cache[word] = syms
    return syms
