"""Reference (single-node) BPE merge trainer.

Classic byte-pair-encoding training over a word-count table [Sennrich
et al., ACL 2016]: repeatedly count adjacent symbol pairs (weighted by
word frequency, overlapping occurrences counted like the canonical
`get_stats`), pick the most frequent pair with a deterministic
tie-break (count DESC, left ASC, right ASC), and apply the merge
greedily left-to-right. This is the oracle the distributed trainer
(engine/spark/bpe.py) must match merge-for-merge.
"""

from __future__ import annotations

from collections import Counter


def split_word(word: str) -> tuple[str, ...]:
    """Initial symbol sequence: characters plus an end-of-word marker
    (the marker lets the learner distinguish suffixes from prefixes)."""
    return tuple(word) + ("</w>",)


def _apply_merge(
    syms: tuple[str, ...], left: str, right: str
) -> tuple[str, ...]:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) with the concatenated symbol."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def tokenize_word(
    word: str, merges: list[tuple[int, str, str, str, int]]
) -> tuple[str, ...]:
    """Apply trained merges to one word in rank order — the serving
    half. Must agree with the distributed map-only tokenizer
    (engine/spark/bpe.bpe_tokenize)."""
    syms = split_word(word)
    for _, left, right, _, _ in merges:
        syms = _apply_merge(syms, left, right)
    return syms


def bpe_merges(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Train ``n_merges`` merges over {word: count}. Returns
    [(rank, left, right, merged, pair_count), ...]; stops early if no
    adjacent pair remains."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, cnt in word_counts.items():
        syms = split_word(word)
        vocab[syms] = vocab.get(syms, 0) + cnt

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt
        if not pairs:
            break
        (left, right), count = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, left + right, count))
        vocab = {
            _apply_merge(syms, left, right): cnt
            for syms, cnt in vocab.items()
        }
    return merges
