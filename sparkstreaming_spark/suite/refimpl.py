"""Clean-room pure-Python reference implementations shared by the pytest
parity anchors (tests/test_bpe.py, tests/test_unigram.py) and the
driver-sim invariant harness (suite/invariants.py).

ONE copy on purpose: these references pin the tokenizer-training
semantics that both the tests and the per-round correctness gate verify
the distributed implementations against — two drifting copies would let
the two gates pin different semantics. They deliberately share nothing
with the Spark implementations they check (textstats/bpe.py,
textstats/unigram.py) beyond the Viterbi segmenter and MICRO scale,
which are the interface under test, not the algorithm.
"""

from __future__ import annotations

import math
from collections import Counter

from ..textstats.unigram import MICRO, viterbi_segment


def reference_bpe(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """Textbook BPE: count adjacent symbol pairs weighted by word
    frequency, merge the most frequent greedily leftmost, repeat.
    Ties: count desc, then (a, b) lexicographic asc. Words carry the
    </w> end-of-word sentinel. Stops when the best pair count < 2."""
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            fused = False
            for s in syms:
                if s == b and out and out[-1] == a and not fused:
                    out[-1] = a + b
                    fused = True
                else:
                    out.append(s)
                    fused = False
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def reference_unigram_em(
    word_counts: dict[str, int], vocab_size: int, max_len: int, iters: int
) -> list[tuple[str, int, int]]:
    """Plain-dict substring-seed + EM unigram trainer: seed the vocab
    with the `vocab_size` most frequent substrings (length <= max_len,
    ties lexicographic), always keep single characters, then `iters`
    rounds of Viterbi re-segmentation and count re-estimation. Returns
    (piece, count, lp_micro) sorted by count desc then piece asc."""
    sub_w: dict[str, int] = {}
    for w, c in word_counts.items():
        for s in range(len(w)):
            for ln in range(1, min(max_len, len(w) - s) + 1):
                sub_w[w[s:s + ln]] = sub_w.get(w[s:s + ln], 0) + c
    seed = sorted(sub_w.items(), key=lambda t: (-t[1], t[0]))[:vocab_size]
    counts = dict(seed)
    chars = {p: w for p, w in sub_w.items() if len(p) == 1}
    for ch, w in chars.items():
        counts.setdefault(ch, w)
    for _ in range(iters):
        total = sum(counts.values())
        lp = {p: round(math.log(c / total) * MICRO) for p, c in counts.items()}
        new: dict[str, int] = {}
        for w, c in word_counts.items():
            for piece in viterbi_segment(w, lp, max_len):
                new[piece] = new.get(piece, 0) + c
        for ch in chars:
            new.setdefault(ch, 1)
        counts = new
    total = sum(counts.values())
    lp = {p: round(math.log(c / total) * MICRO) for p, c in counts.items()}
    return sorted(
        ((p, c, lp[p]) for p, c in counts.items()), key=lambda t: (-t[1], t[0])
    )
