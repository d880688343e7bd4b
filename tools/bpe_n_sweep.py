"""Curve in merge count N for BPE training (round 9).

The per-round Spark path costs one job per merge; the driver-local
path (auto-selected above BPE_SPARK_ROUNDS_MAX) collects the bounded
word-frequency table once and maintains pair counts incrementally.
This sweep times the local loop at N=6/100/1000 over a synthetic
20k-word vocab with deep merge structure (the fixture's 31-word vocab
early-stops around N~40), plus the Spark path at N=6 for the per-round
cost contrast. Run: python tools/bpe_n_sweep.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from map_reduce_indexing_spark.operators.bpe import (  # noqa: E402
    train_bpe_merges_from_vocab,
)


def synthetic_vocab(n_words: int = 20_000) -> dict[str, int]:
    stems = ["inter", "nation", "process", "transform", "comput",
             "distribut", "aggregat", "partition"]
    sufs = ["ing", "ation", "ed", "er", "ness", "ly", "ive", "al"]
    vocab = {}
    i = 0
    while len(vocab) < n_words:
        w = (stems[i % 8] + sufs[(i // 8) % 8] + stems[(i // 64) % 8]
             + str(i % 97))
        vocab[w] = 1 + (i % 53)
        i += 1
    return vocab


def main():
    vocab = synthetic_vocab()
    out = {}
    for n in (6, 100, 1000):
        t0 = time.perf_counter()
        merges = train_bpe_merges_from_vocab(vocab, n)
        out[f"local_n{n}"] = {
            "sec": round(time.perf_counter() - t0, 3),
            "merges_learned": len(merges),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
