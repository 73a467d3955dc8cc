"""Fused Pallas CBN decoder (`ops/cbn_decoder.py`) vs the layer-by-layer
flax `DecoderCBatchNorm` (interpret mode on CPU; the real kernel runs on
TPU with identical lowering).

Weight regime note: parity is asserted at realistic scales (the real
init = identity CBN affine + zero-init fc_1, plus a small perturbation),
where activations are O(1) like a trained decoder's. At absurd weight
scales ReLU-boundary rounding flips amplify and NO two evaluation orders
agree — including the flax decoder against itself across backends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rfdnet_tpu.models.layers import DecoderCBatchNorm
from rfdnet_tpu.ops.cbn_decoder import (
    N_BLOCKS,
    fold_cbn_constants,
    fused_cbn_decode,
    make_fused_decoder,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    Nb, T, CD = 3, 700, 512
    dec = DecoderCBatchNorm()
    p = jnp.asarray(rng.randn(Nb, T, 3).astype(np.float32) * 0.3)
    z = jnp.zeros((Nb, 32))
    c = jnp.asarray(rng.randn(Nb, CD).astype(np.float32) * 0.5)
    vs = dec.init(jax.random.PRNGKey(0), p, z, c, False)
    # realistic regime: init (identity CBNs, zero fc_1) + small noise
    vs = jax.tree_util.tree_map(
        lambda l: l + jnp.asarray(
            rng.randn(*l.shape).astype(np.float32) * 0.02
        ),
        vs,
    )
    return dec, vs, p, z, c


def _fused(vs, p, z, c, mxu_dtype):
    dp, st = vs["params"], vs["batch_stats"]
    h0 = p @ dp["fc_p"]["kernel"] + dp["fc_p"]["bias"]
    h0 = h0 + (z @ dp["fc_z"]["kernel"] + dp["fc_z"]["bias"])[:, None, :]
    sc, sh = fold_cbn_constants(dp, st, c)
    stack = lambda f: jnp.stack(
        [dp[f"block{i}"][f]["kernel"] for i in range(N_BLOCKS)]
    )
    stackb = lambda f: jnp.stack(
        [dp[f"block{i}"][f]["bias"] for i in range(N_BLOCKS)]
    )
    return fused_cbn_decode(
        h0, sc, sh, stack("fc_0"), stackb("fc_0"), stack("fc_1"),
        stackb("fc_1"), dp["fc_out"]["kernel"][:, 0],
        dp["fc_out"]["bias"][0], interpret=True, mxu_dtype=mxu_dtype,
    )


def test_fused_matches_flax_f32(setup):
    """f32-operand mode: the fold + fused chain is the same math as the
    flax decoder up to reduction order."""
    dec, vs, p, z, c = setup
    ref = np.asarray(dec.apply(vs, p, z, c, False))
    out = np.asarray(_fused(vs, p, z, c, jnp.float32))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


def test_fused_bf16_operands_close(setup):
    """Default bf16-operand mode (== the MXU's DEFAULT f32 behavior and
    the decoder_dtype='bfloat16' chain): logits within bf16 tolerance,
    occupancy signs essentially unchanged."""
    dec, vs, p, z, c = setup
    ref = np.asarray(dec.apply(vs, p, z, c, False))
    out = np.asarray(_fused(vs, p, z, c, jnp.bfloat16))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 2e-2 * max(scale, 1.0)
    agree = (out >= 0) == (ref >= 0)
    near = np.abs(ref) < 1e-2 * max(scale, 1.0)
    assert (agree | near).mean() == 1.0


def test_decode_occupancy_impl_pallas_in_model():
    """ISCNet.decode_occupancy(impl='pallas') — the route the Tester and
    the fused generate use on TPU — must agree with the default flax
    chain (interpret-mode lowering on CPU)."""
    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch
    from rfdnet_tpu.models import ISCNet

    dc = ScannetConfig()
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr, phase="completion",
        completion_limit=4, generate_limit=8,
    )
    batch = synthetic_scene_batch(
        np.random.RandomState(0), batch_size=2, num_points=4096,
        mean_size_arr=dc.mean_size_arr,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(
        jax.random.PRNGKey(0), batch, train=False,
        rng=jax.random.PRNGKey(1),
    )
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(8, 512).astype(np.float32) * 0.3)
    cls = jax.nn.one_hot(jnp.arange(8), 8)
    pts = jnp.asarray(
        rng.uniform(-0.55, 0.55, (8, 200, 3)).astype(np.float32)
    )
    ref = np.asarray(model.apply(
        variables, feats, cls, pts, method=ISCNet.decode_occupancy,
        mutable=False,
    ))
    out = np.asarray(model.apply(
        variables, feats, cls, pts, method=ISCNet.decode_occupancy,
        mutable=False, impl="pallas",
    ))
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(out, ref, atol=2e-2 * scale)


def test_make_fused_decoder_matches_decode_occupancy():
    """End-to-end drop-in: make_fused_decoder vs the jitted
    ISCNet.decode_occupancy partial on a real model tree."""
    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch
    from rfdnet_tpu.models import ISCNet

    dc = ScannetConfig()
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr, phase="completion",
        completion_limit=4, generate_limit=8,
    )
    batch = synthetic_scene_batch(
        np.random.RandomState(0), batch_size=2, num_points=4096,
        mean_size_arr=dc.mean_size_arr,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = model.init(
        jax.random.PRNGKey(0), batch, train=False,
        rng=jax.random.PRNGKey(1),
    )
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(4, 512).astype(np.float32) * 0.3)
    cls = jax.nn.one_hot(jnp.asarray([1, 3, 5, 7]), 8)
    pts = jnp.asarray(rng.uniform(-0.55, 0.55, (4, 300, 3)).astype(
        np.float32))

    ref = model.apply(
        variables, feats, cls, pts, method=ISCNet.decode_occupancy,
        mutable=False,
    )
    fused = make_fused_decoder(model, variables, interpret=True)
    out = fused(feats, cls, pts)
    scale = max(float(np.abs(np.asarray(ref)).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-2 * scale,
    )
