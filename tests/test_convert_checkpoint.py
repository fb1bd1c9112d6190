"""convert_checkpoint CLI: torch file -> validated flat weights."""

import sys

import numpy as np
import torch

from pvr_habitat_tpu.models import convert
from tests.torch_ref import resnet as tref


def test_convert_moco_checkpoint(tmp_path):
    from pvr_habitat_tpu.tools import convert_checkpoint as cc

    # Build a MoCo-style checkpoint: module.encoder_q.* + extras.
    model = tref.resnet50()
    state = {f"module.encoder_q.{k}": v for k, v in model.state_dict().items()}
    state["module.encoder_q.fc.0.weight"] = torch.zeros(2, 2)
    state["module.encoder_k.conv1.weight"] = torch.zeros(64, 3, 7, 7)
    src = str(tmp_path / "moco_aug_custom.pth")
    torch.save({"state_dict": state}, src)

    out = str(tmp_path / "converted.tar")
    sys.argv = ["convert_checkpoint", "--embedding_name", "moco_aug",
                "--checkpoint", src, "--out", out]
    cc.main()

    params = convert.load_flat(out)
    want = convert.torch_state_dict_to_flat(model.state_dict())
    assert set(params) == set(want)
    np.testing.assert_array_equal(np.asarray(params["conv1.weight"]),
                                  np.asarray(want["conv1.weight"]))
