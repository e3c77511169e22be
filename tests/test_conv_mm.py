"""Matmul-conv primitives vs XLA lax convs (ground truth on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iris_tts_tpu.ops.conv import conv1d_mm, conv2d_mm, conv_transpose1d_mm


# Both implementations must agree with ground truth: 'matmul' is the shifted-
# matmul decomposition, 'native' the XLA conv lowering (the serving default).
IMPLS = ("matmul", "native")


def _lax_conv(x, w, stride=1, dilation=1, padding=(0, 0), groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [padding],
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


@pytest.mark.parametrize(
    "k,stride,dilation,groups",
    [
        (1, 1, 1, 1),
        (3, 1, 1, 1),
        (5, 1, 2, 1),
        (7, 1, 3, 1),
        (11, 1, 5, 1),
        (5, 2, 1, 1),
        (41, 2, 1, 4),
        (41, 4, 1, 16),
        (15, 1, 1, 1),
    ],
)
@pytest.mark.parametrize("impl", IMPLS)
def test_conv1d_mm_matches_lax(rng, k, stride, dilation, groups, impl):
    cin, cout, t = 16, 32, 64
    x = jnp.asarray(rng.standard_normal((2, t, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((k, cin // groups, cout)).astype(np.float32)
    )
    pad = ((k - 1) * dilation // 2, (k - 1) * dilation // 2)
    want = _lax_conv(x, w, stride, dilation, pad, groups)
    got = conv1d_mm(
        x, w, stride=stride, dilation=dilation, padding=pad, groups=groups,
        impl=impl,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4
    )


@pytest.mark.parametrize("k,u", [(16, 8), (4, 2), (8, 4), (6, 2), (3, 1)])
@pytest.mark.parametrize("impl", IMPLS + ("pair",))
def test_conv_transpose1d_mm_matches_torch(rng, k, u, impl):
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    cin, cout, t = 8, 4, 12
    tconv = tnn.ConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2,
                                bias=False)
    x = rng.standard_normal((2, t, cin)).astype(np.float32)
    with torch.no_grad():
        want = (
            tconv(torch.from_numpy(x.transpose(0, 2, 1)))
            .numpy()
            .transpose(0, 2, 1)
        )
    # torch weight [C_in, C_out, K] → our layout [K, C_in, C_out], NO flip.
    w = tconv.weight.detach().numpy().transpose(2, 0, 1)
    got = conv_transpose1d_mm(
        jnp.asarray(x), jnp.asarray(w), stride=u, impl=impl
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
def test_conv2d_mm_matches_lax(rng, impl):
    x = jnp.asarray(rng.standard_normal((2, 20, 5, 4)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((5, 1, 4, 8)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, w, (3, 1), [(2, 2), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = conv2d_mm(x, w, strides=(3, 1), padding=((2, 2), (0, 0)),
                    impl=impl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_layers_same_padding_matches_flax(rng):
    """Conv1d module with SAME padding == flax nn.Conv for strided cases."""
    from flax import linen as nn

    from iris_tts_tpu.models.layers import Conv1d

    x = jnp.asarray(rng.standard_normal((2, 17, 6)).astype(np.float32))
    for k, s, d in [(5, 2, 1), (3, 1, 1), (5, 1, 2), (4, 2, 1)]:
        ours = Conv1d(features=8, kernel_size=k, stride=s, dilation=d)
        theirs = nn.Conv(8, (k,), strides=(s,), kernel_dilation=(d,),
                         padding="SAME")
        key = jax.random.PRNGKey(0)
        p = theirs.init(key, x)["params"]
        want = theirs.apply({"params": p}, x)
        got = ours.apply({"params": p}, x)  # identical param layout
        assert got.shape == want.shape, (k, s, d)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5
        )


def test_conv_transpose_module_shape(rng):
    from iris_tts_tpu.models.layers import ConvTranspose1d

    mod = ConvTranspose1d(features=4, kernel_size=16, stride=8)
    x = jnp.asarray(rng.standard_normal((1, 10, 8)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    y = mod.apply({"params": params}, x)
    assert y.shape == (1, 80, 4)  # T*u exactly
