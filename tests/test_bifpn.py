"""BiFPN neck golden parity vs reference (net/bifpn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import tests.ref_compat as rc
from hydranet_tpu.models.bifpn import StackBiFPN
from hydranet_tpu.utils.torch_import import import_state_dict


def _nhwc(t):
    return np.transpose(t, (0, 2, 3, 1))


@pytest.mark.parametrize("num_stages", [4, 5])
def test_stack_bifpn_parity(num_stages):
    rc.install()
    from net.bifpn import stackBiFPN as RefStack

    nc = 16
    repeats = 2
    if num_stages == 5:
        # big preset shape: 5 backbone stages, real stride-64 P6 source
        chans = [12, 24, 40, 56]
        feats = [np.random.randn(1, c, s, s).astype(np.float32)
                 for c, s in zip([8] + chans, [64, 32, 16, 8, 4])]
    else:
        chans = [12, 24, 40]
        feats = [np.random.randn(1, c, s, s).astype(np.float32)
                 for c, s in zip([8] + chans, [64, 32, 16, 8])]

    ref = RefStack(fpn_num_filters=nc, fpn_cell_repeats=repeats,
                   conv_channel_coef=chans).eval()
    with torch.no_grad():
        want = [f.numpy() for f in ref([torch.from_numpy(f) for f in feats])]

    model = StackBiFPN(fpn_num_filters=nc, fpn_cell_repeats=repeats,
                       conv_channel_coef=tuple(chans))
    inputs = [jnp.asarray(_nhwc(f)) for f in feats]
    variables = model.init(jax.random.PRNGKey(0), inputs)
    variables = import_state_dict(variables, ref.state_dict())
    got = model.apply(variables, inputs, train=False)

    assert len(got) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.transpose(np.asarray(g), (0, 3, 1, 2)),
                                   w, rtol=1e-3, atol=1e-4)
