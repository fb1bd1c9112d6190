"""ResNet family parity vs. the torch oracle: converted weights must
produce the same features (<=1e-3, the BASELINE.md parity contract) and
the documented output dims (SURVEY.md §2.4)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pvr_habitat_tpu.models import convert, resnet
from tests.torch_ref import resnet as tref


def _run_pair(torch_model, inner_state_dict_model, spec, in_hw=64,
              atol=1e-3, batch=2, seed=0):
    torch_model.eval()
    # Randomize BN running stats so eval-mode normalization is non-trivial.
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, buf in inner_state_dict_model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=gen) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)

    params = convert.torch_state_dict_to_flat(
        inner_state_dict_model.state_dict())

    rng = np.random.RandomState(seed)
    x = rng.randn(batch, in_hw, in_hw, 3).astype(np.float32)
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(resnet.apply(params, jnp.asarray(x), spec))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)
    return got


def test_resnet18_parity():
    model = tref.resnet18()
    _run_pair(model, model, resnet.ResNetSpec(18))


def test_resnet50_parity():
    model = tref.resnet50()
    _run_pair(model, model, resnet.ResNetSpec(50))


@pytest.mark.parametrize("cut,out_dim", [("l3", 2156), ("l4", 2058)])
def test_resnet50_compressed_parity_and_dims(cut, out_dim):
    wrapped = tref.resnet50_compressed(cut)
    got = _run_pair(wrapped, wrapped.model, resnet.ResNetSpec(50, cut=cut),
                    in_hw=224, batch=1)
    assert got.shape[-1] == out_dim
    assert resnet.ResNetSpec(50, cut=cut).out_size(224) == out_dim


def test_out_sizes_match_survey_table():
    assert resnet.ResNetSpec(18).out_size() == 512
    assert resnet.ResNetSpec(34).out_size() == 512
    assert resnet.ResNetSpec(50).out_size() == 2048


def test_init_params_cover_torch_names():
    """Our fresh init produces exactly the torch param/buffer set."""
    for depth, cut, builder in [
        (50, None, lambda: tref.resnet50()),
        (50, "l3", lambda: tref.resnet50_compressed("l3").model),
        (50, "l4", lambda: tref.resnet50_compressed("l4").model),
        (18, None, lambda: tref.resnet18()),
    ]:
        spec = resnet.ResNetSpec(depth, cut=cut)
        ours = set(resnet.init_params(spec, np.random.RandomState(0)))
        sd = builder().state_dict()
        theirs = {k for k in sd if not k.endswith("num_batches_tracked")}
        assert ours == theirs, (depth, cut, ours ^ theirs)


def test_moco_key_surgery():
    """module.encoder_q. stripping keeps encoder, drops fc
    (reference: src/vision_models/moco.py:14-21)."""
    sd = {
        "module.encoder_q.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "module.encoder_q.fc.0.weight": np.zeros((2, 2), np.float32),
        "module.encoder_k.conv1.weight": np.zeros((64, 3, 7, 7), np.float32),
        "queue": np.zeros(4, np.float32),
    }
    out = convert.moco_encoder_q(sd)
    assert list(out) == ["conv1.weight"]


def test_module_prefix_surgery():
    sd = {"module.conv1.weight": 1, "fc.weight": 2}
    out = convert.strip_module_prefix(sd)
    assert set(out) == {"conv1.weight", "fc.weight"}
