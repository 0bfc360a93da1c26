"""Deterministic synthetic corpus for the trained-checkpoint accuracy gate.

VERDICT r4 weak #4: every accuracy number to date ran on random-init
weights, where quant drift is uninterpretable. This corpus gives a tiny
llama something REAL to learn so the gate can measure task-accuracy drop
(the in-environment analog of BASELINE's "≤1% GSM8K drop"; reference:
python/sglang/test/few_shot_gsm8k.py):

- **Bigram stream**: a seeded sparse Markov chain (each token has 4
  successors, Zipf-weighted). Learnable to ~1.2 nats; measures logit
  calibration.
- **Copy task**: ``BOS k-tokens SEP k-tokens`` — the model must induct
  the first half. Second-half accuracy is attention-precision sensitive,
  exactly where KV/quant error shows up first.

Everything is seeded; train/eval use disjoint seeds.
"""

from __future__ import annotations

import numpy as np

VOCAB = 2048
BOS, SEP = 1, 2
LOW = 8          # payload tokens start here (0..7 reserved)
SEQ_LEN = 64


def transition_table(seed: int = 1234, succ: int = 4) -> np.ndarray:
    """[VOCAB, succ] successor ids + implied Zipf weights (0.52/0.26/
    0.13/0.09)."""
    rng = np.random.RandomState(seed)
    return rng.randint(LOW, VOCAB, size=(VOCAB, succ))


_WEIGHTS = np.asarray([0.52, 0.26, 0.13, 0.09])


def bigram_stream(n_tokens: int, table: np.ndarray, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    out = np.empty((n_tokens,), np.int64)
    tok = int(rng.randint(LOW, VOCAB))
    choices = rng.choice(table.shape[1], size=n_tokens, p=_WEIGHTS)
    for i in range(n_tokens):
        out[i] = tok
        tok = int(table[tok, choices[i]])
    return out


def copy_sequence(rng: np.random.RandomState, seq_len: int = SEQ_LEN):
    k = (seq_len - 2) // 2
    payload = rng.randint(LOW, VOCAB, size=k)
    seq = np.concatenate([[BOS], payload, [SEP], payload])
    return seq[:seq_len]


def make_batch(rng: np.random.RandomState, table: np.ndarray,
               batch: int, seq_len: int = SEQ_LEN) -> np.ndarray:
    """[batch, seq_len] int64 — half bigram windows, half copy tasks."""
    rows = []
    for i in range(batch):
        if i % 2 == 0:
            rows.append(
                bigram_stream(seq_len, table, seed=int(rng.randint(1 << 30)))
            )
        else:
            rows.append(copy_sequence(rng, seq_len))
    return np.stack(rows)


def eval_sets(table: np.ndarray, n: int = 32, seq_len: int = SEQ_LEN,
              seed: int = 999_001):
    """Held-out eval rows: (bigram [n, T], copy [n, T]). The copy task's
    scored region is the second half (positions > k+1)."""
    rng = np.random.RandomState(seed)
    big = np.stack([
        bigram_stream(seq_len, table, seed=int(rng.randint(1 << 30)))
        for _ in range(n)
    ])
    cp = np.stack([copy_sequence(rng, seq_len) for _ in range(n)])
    return big, cp
