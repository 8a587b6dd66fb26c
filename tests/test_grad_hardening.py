"""Silent-audio gradient hardening + LSTM dropout plumbing.

VERDICT r1 items 5/6: jnp.abs/jnp.angle have NaN gradients at 0, and zero
coefficients occur in padded/silent audio — one quiet batch must not abort
training with a NaN loss. The reference shares the torch.angle exposure
(norbert/__init__.py:230-240); we harden instead of matching the landmine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from xumx_slicq_tpu.models import Unmix
from xumx_slicq_tpu.ops.slicqt import SliCQT
from xumx_slicq_tpu.ops import wiener as wiener_ops
from xumx_slicq_tpu.loss import complex_mse_loss
from xumx_slicq_tpu.training import make_train_step

TINY = dict(scale="mel", fbins=12, fmin=200.0)
SEQ_DUR = 0.3
SR = 44100


def _all_finite(tree) -> bool:
    return all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(tree))


def _setup(lstm=False, sdr_mcoef=-1.0, batch=2, amp=False):
    L = int(SEQ_DUR * SR)
    t = SliCQT(**TINY)
    shapes = t.block_shapes(batch, 2, L)
    m = Unmix(shapes, lstm=lstm, amp=amp)
    params, stats = m.init(jax.random.PRNGKey(0))
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    train_step, _ = make_train_step(t, m, opt, sdr_mcoef=sdr_mcoef)
    return t, m, params, stats, opt_state, train_step, L


@pytest.mark.parametrize("amp", [False, True], ids=["fp32", "bf16"])
@pytest.mark.parametrize("batch_kind", ["all_zero", "silent_stem"])
def test_silent_batch_finite_train_step(batch_kind, amp):
    """One full train step on silent audio: finite loss AND finite params
    after the AdamW update (NaN grads would poison the params). Runs in
    both fp32 and bf16 mixed precision (--bf16 trainer mode)."""
    t, m, params, stats, opt_state, train_step, L = _setup(sdr_mcoef=0.1, amp=amp)
    rng = np.random.default_rng(0)
    if batch_kind == "all_zero":
        batch = np.zeros((2, 5, 2, L), np.float32)
    else:
        batch = (rng.standard_normal((2, 5, 2, L)) * 0.1).astype(np.float32)
        batch[:, 1] = 0.0  # one silent target stem
        batch[0, 0, :, : L // 2] = 0.0  # half-silent mixture (padding pattern)
    params2, _, _, loss = train_step(params, stats, opt_state, jnp.asarray(batch))
    assert np.isfinite(float(loss)), f"loss {loss} not finite on {batch_kind}"
    assert _all_finite(params2), f"params not finite after step on {batch_kind}"


def test_wiener_grad_finite_at_zero_mixture():
    """d wiener / d v must be finite where the mixture is exactly zero."""
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.standard_normal((1, 3, 4, 2)) * 0.1).astype(np.complex64))
    x = x.at[:, 0].set(0.0)  # a fully-silent frame
    v0 = jnp.asarray(np.abs(rng.standard_normal((1, 3, 4, 2, 4))).astype(np.float32))
    v0 = v0.at[:, 1].set(0.0)  # and a zero magnitude estimate elsewhere

    def f(v):
        y = wiener_ops.wiener(v, x, iterations=1)
        return jnp.sum(y.real ** 2 + y.imag ** 2)

    g = jax.grad(f)(v0)
    assert np.isfinite(np.asarray(g)).all()


def test_phasemix_grad_finite_at_zero_mixture():
    mix = jnp.zeros((1, 2, 3, 2, 4), jnp.complex64)
    mag = jnp.ones((4, 1, 2, 3, 2, 4), jnp.float32)

    def f(m):
        y = wiener_ops.blockwise_phasemix_sep(mix, m)
        return jnp.sum(y.real ** 2 + y.imag ** 2)

    g = jax.grad(f)(mag)
    assert np.isfinite(np.asarray(g)).all()
    # value parity with exp(i*angle(0)) == 1
    y = wiener_ops.blockwise_phasemix_sep(mix, mag)
    np.testing.assert_allclose(np.asarray(y.real), 1.0)


def test_complex_mse_grad_finite_at_exact_match():
    """abs(d)**2's VJP is NaN at d == 0 — pred == target must be safe."""
    tgt = jnp.asarray(np.zeros((4, 1, 2, 3, 2, 4), np.complex64))

    def f(p):
        return complex_mse_loss([p], [tgt])

    g = jax.grad(f)(tgt)
    assert np.isfinite(np.asarray(g.real)).all()


def test_lstm_dropout_rng_plumbed():
    """Train-mode LSTM masks must differ across dropout rngs and be
    deterministic in eval / rng-less mode (reference model.py:345 trains
    with nn.LSTM(dropout=0.4))."""
    L = int(SEQ_DUR * SR)
    t = SliCQT(**TINY)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, L)).astype(np.float32))
    X = t.forward(x)
    m = Unmix([c.shape for c in X], lstm=True)
    params, stats = m.init(jax.random.PRNGKey(0))

    _, m1, _ = m.apply(params, stats, X, train=True, rng=jax.random.PRNGKey(1))
    _, m2, _ = m.apply(params, stats, X, train=True, rng=jax.random.PRNGKey(2))
    _, m1b, _ = m.apply(params, stats, X, train=True, rng=jax.random.PRNGKey(1))
    diff = max(float(jnp.abs(a - b).max()) for a, b in zip(m1, m2))
    assert diff > 0, "dropout rng had no effect on train-mode LSTM masks"
    same = max(float(jnp.abs(a - b).max()) for a, b in zip(m1, m1b))
    assert same == 0.0, "same rng must reproduce the same masks"

    _, e1, _ = m.apply(params, stats, X, train=False)
    _, e2, _ = m.apply(params, stats, X, train=False)
    assert max(float(jnp.abs(a - b).max()) for a, b in zip(e1, e2)) == 0.0


def test_lstm_train_step_with_rng_finite():
    t, m, params, stats, opt_state, train_step, L = _setup(lstm=True)
    rng = np.random.default_rng(2)
    batch = (rng.standard_normal((2, 5, 2, L)) * 0.1).astype(np.float32)
    params2, _, _, loss = train_step(
        params, stats, opt_state, jnp.asarray(batch), jax.random.PRNGKey(7)
    )
    assert np.isfinite(float(loss))
    assert _all_finite(params2)
