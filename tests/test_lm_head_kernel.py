"""Fused lm_head+sampling kernel vs the XLA einsum+sampler reference.

Reference analog: sampler/logits unit tests in python/sglang/test/
(e.g. test_block_fp8.py style kernel-vs-reference diffing). Runs in
interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_custom_tpu.ops.lm_head import fused_lm_head_sample


def make_case(B=8, H=64, V=640, seed=0, dominant=None):
    rng = np.random.RandomState(seed)
    hidden = jnp.asarray(rng.randn(B, H).astype(np.float32))
    w = jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.1)
    if dominant is not None:
        # force a clearly dominant logit per row
        w = w.at[:, dominant].add(hidden.sum(0) * 0.0)
    return hidden, w


def xla_reference(hidden, w, softcap=0.0):
    logits = jnp.einsum(
        "bh,hv->bv", hidden, w, preferred_element_type=jnp.float32
    )
    if softcap:
        logits = softcap * jnp.tanh(logits / softcap)
    return logits


@pytest.mark.parametrize("V", [640, 513])  # multiple + ragged last tile
@pytest.mark.parametrize("softcap", [0.0, 30.0])
def test_greedy_matches_xla(V, softcap):
    hidden, w = make_case(V=V)
    B = hidden.shape[0]
    logits = xla_reference(hidden, w, softcap)
    want_tok = jnp.argmax(logits, axis=-1)
    want_lp = jax.nn.log_softmax(logits, axis=-1)[
        jnp.arange(B), want_tok
    ]
    tok, lp = fused_lm_head_sample(
        hidden, w, jnp.zeros((B,), jnp.float32), jnp.int32(7),
        softcap=softcap, stochastic=False, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(want_tok))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(want_lp), rtol=1e-5, atol=1e-5
    )


def test_stochastic_mixed_greedy_rows():
    hidden, w = make_case(V=640, seed=3)
    B = hidden.shape[0]
    logits = xla_reference(hidden, w)
    temps = jnp.asarray([0.0, 1.0, 0.0, 0.5, 2.0, 0.0, 1.0, 0.01], jnp.float32)
    tok, lp = fused_lm_head_sample(
        hidden, w, temps, jnp.int32(11), stochastic=True, interpret=True,
    )
    tok, lp = np.asarray(tok), np.asarray(lp)
    want_tok = np.asarray(jnp.argmax(logits, axis=-1))
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for b in range(B):
        assert 0 <= tok[b] < 640
        if float(temps[b]) == 0.0:
            assert tok[b] == want_tok[b], f"greedy row {b}"
        # logprob is always the raw log_softmax of the chosen token
        np.testing.assert_allclose(lp[b], logp[b, tok[b]], rtol=1e-5, atol=1e-5)
    # determinism for a fixed seed
    tok2, _ = fused_lm_head_sample(
        hidden, w, temps, jnp.int32(11), stochastic=True, interpret=True,
    )
    np.testing.assert_array_equal(tok, np.asarray(tok2))
    # different seed changes something for the hot rows
    tok3, _ = fused_lm_head_sample(
        hidden, w, temps, jnp.int32(999), stochastic=True, interpret=True,
    )
    assert np.any(np.asarray(tok3) != tok)


def test_stochastic_low_temp_is_argmax():
    hidden, w = make_case(V=640, seed=5)
    B = hidden.shape[0]
    logits = xla_reference(hidden, w)
    # temperature -> 0 concentrates on the argmax
    tok, _ = fused_lm_head_sample(
        hidden, w, jnp.full((B,), 1e-4, jnp.float32), jnp.int32(1),
        stochastic=True, interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(tok), np.asarray(jnp.argmax(logits, axis=-1))
    )


def test_stochastic_distribution():
    """A two-outcome distribution should be sampled near its true freqs."""
    B, H, V = 8, 64, 256
    hidden = jnp.ones((B, H), jnp.float32) / H
    w = np.zeros((H, V), np.float32)
    w[:, 10] = 6.0   # p(10) = p(20) = e^6/(2e^6 + 254) ~ 0.38 each
    w[:, 20] = 6.0
    w = jnp.asarray(w)
    counts = {10: 0, 20: 0, "other": 0}
    n = 50
    for s in range(n):
        tok, _ = fused_lm_head_sample(
            hidden, w, jnp.ones((B,), jnp.float32), jnp.int32(s),
            stochastic=True, interpret=True,
        )
        for t in np.asarray(tok):
            counts[int(t) if int(t) in (10, 20) else "other"] += 1
    total = n * B
    # tokens 10/20 dominate (each has prob ~ e / (2e + 254) ~ 0.53 total)
    assert counts[10] + counts[20] > total * 0.35
    assert counts[10] > 0 and counts[20] > 0
