"""RegNet/AnyNet backbone: parameterization + golden parity vs reference."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

import tests.ref_compat as rc
from hydranet_tpu.models.regnet import RegNetY, regnet_stage_params
from hydranet_tpu.utils.torch_import import import_state_dict


def test_regnet_parameterization_big_preset():
    # Documented expected output for the big preset (SURVEY.md §7 step 3).
    widths, depths, gws = regnet_stage_params(24, 36, 2.5, 30, 1, 8)
    assert widths == (24, 64, 152, 376, 936)
    assert depths == (1, 1, 4, 10, 14)
    assert all(g == 8 for g in gws)


def test_regnet_parameterization_matches_reference():
    rc.install()
    from net.regnet import RegNetX as RefRegNetX

    for params in [(24, 36, 2.5, 30, 1, 8), (24, 36, 2.5, 16, 1, 8),
                   (32, 24, 2.0, 10, 1, 16)]:
        w0, wa, wm, d, b, g = params
        widths, depths, gws = regnet_stage_params(w0, wa, wm, d, b, g)
        ref = RefRegNetX(w0, wa, wm, d, b, g, stride=2, se_ratio=None)
        ref_widths = []
        ref_depths = []
        for name, stage in ref.net.named_children():
            if not name.startswith("stage"):
                continue
            blocks = list(stage.blocks.children())
            ref_depths.append(len(blocks))
            ref_widths.append(blocks[0].conv_block_3[0].out_channels)
        assert list(widths) == ref_widths, params
        assert list(depths) == ref_depths, params


def test_backbone_forward_parity():
    """Full RegNetY forward vs reference with identical weights (depth 8 for
    speed; exercises stem, strided/grouped convs, SE, shortcuts)."""
    rc.install()
    from net.regnet import RegNetY as RefRegNetY

    kwargs = dict(initial_width=24, slope=36, quantized_param=2.5,
                  network_depth=8, bottleneck_ratio=1, group_width=8,
                  stride=2, se_ratio=4)
    ref = RefRegNetY(*kwargs.values()).eval()

    model = RegNetY(**kwargs)
    x = np.random.randn(1, 3, 64, 64).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    variables = import_state_dict(variables, ref.state_dict())

    with torch.no_grad():
        want = [f.numpy() for f in ref(torch.from_numpy(x))]
    got = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      train=False)

    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.transpose(np.asarray(g), (0, 3, 1, 2)), w, rtol=1e-3, atol=1e-4)
