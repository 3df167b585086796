#!/usr/bin/env python
"""Convert a torchvision ``inception_v3`` checkpoint to staged Flax params.

Usage:
    python tools/convert_inception.py <inception_v3.pth> \
        [data/pretrained/inception/inception_v3.npz]

The output .npz is what ``models/inception.py:load_inception_params`` (and
therefore canonical FID via utils/fid.py:FlaxInceptionFeatureExtractor and
FID_EXTRACTOR=inception tools/fid_eval.py) picks up — after this one command,
FID runs with no torch/torchvision dependency.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    src = sys.argv[1]
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "data/pretrained/inception/inception_v3.npz"
    )

    import numpy as np

    from stable_diffusion_pytorch_tpu.models.inception import (
        convert_torchvision_inception,
    )

    if src.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(src)
    else:
        import torch

        state = torch.load(src, map_location="cpu", weights_only=True)
    params = convert_torchvision_inception(state)

    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, path)
            else:
                flat[path] = np.asarray(v)

    walk(params["params"], "")
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    np.savez(dst, **flat)
    n_params = sum(v.size for v in flat.values())
    print(f"wrote {dst}: {len(flat)} arrays, {n_params / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
