"""Convert a reference PyTorch encoder checkpoint to this framework's
flat format.

  python -m pvr_habitat_tpu.tools.convert_checkpoint \\
      --embedding_name moco_aug --checkpoint moco_aug.pth.tar \\
      --out moco_aug.converted.tar

Applies the same key surgery the reference uses for that encoder
(module. / module.encoder_q. stripping, backbone extraction) and
validates the full expected parameter set.  After conversion, dropping
the ORIGINAL torch file under --data_path works too (the registry loads
it directly); this tool is for ahead-of-time conversion and
validation."""

import argparse

import numpy as np

from pvr_habitat_tpu.models import convert
from pvr_habitat_tpu.models.registry import CHECKPOINT_FILES, build_encoder


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--embedding_name", required=True,
                        choices=sorted(CHECKPOINT_FILES))
    parser.add_argument("--checkpoint", required=True,
                        help="Path to the torch .pth/.tar file.")
    parser.add_argument("--out", required=True,
                        help="Output path for the converted weights.")
    args = parser.parse_args()

    import os
    import shutil
    import tempfile

    # Stage the file under the reference's expected filename so the
    # registry's loader (surgery + validation) does the work.
    with tempfile.TemporaryDirectory() as tmp:
        staged = os.path.join(tmp, CHECKPOINT_FILES[args.embedding_name])
        shutil.copy(args.checkpoint, staged)
        handle = build_encoder(args.embedding_name, pretrained=True,
                               checkpoint_dir=tmp)
    convert.save_flat(args.out, handle.params,
                      extra={"embedding_name": args.embedding_name})
    n_params = sum(int(np.prod(v.shape)) for v in handle.params.values())
    print(f"converted {args.embedding_name}: "
          f"{len(handle.params)} tensors, {n_params / 1e6:.1f}M params "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
