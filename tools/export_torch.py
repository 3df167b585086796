#!/usr/bin/env python
"""Export a TPU-trained checkpoint to the PyTorch reference's format.

The inverse of the torch->Flax import path (utils/torch_port.py): the written
``.pt`` loads into the reference's UNetModel / AutoEncoderKL with
``load_state_dict(..., strict=True)``, so weights can round-trip between the
frameworks in BOTH directions.

Usage:
    python tools/export_torch.py --checkpoint model/unet --export-model unet \
        --output unet_export.pt [model-config flags matching the training run]
    python tools/export_torch.py --checkpoint model/vae --export-model vae \
        --output vae_export.pt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.platform import ensure_platform

    ensure_platform()

    from stable_diffusion_pytorch_tpu.config import load_config
    from stable_diffusion_pytorch_tpu.utils.checkpoint import (
        find_latest_checkpoint,
        load_params_for_inference,
    )
    from stable_diffusion_pytorch_tpu.utils.torch_port import (
        export_reference_autoencoder,
        export_reference_unet,
        save_torch_state_dict,
    )

    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--checkpoint", required=True,
                        help="trainer checkpoint dir (or ckpt root; latest wins)")
    parser.add_argument("--export-model", choices=["unet", "vae"], default="unet")
    parser.add_argument("--output", default=None,
                        help="output .pt path (default <model>_export.pt)")
    ns, rest = parser.parse_known_args(argv)

    _, cfg = load_config(rest)
    path = ns.checkpoint
    if os.path.isdir(path) and not os.path.basename(path).startswith(
        ("checkpoint", "epoch")
    ):
        path = find_latest_checkpoint(path) or path
    params = load_params_for_inference(path)

    if ns.export_model == "unet":
        sd = export_reference_unet(params, cfg.model.unet)
    else:
        sd = export_reference_autoencoder(params, cfg.model.autoencoder)
    out = ns.output or f"{ns.export_model}_export.pt"
    save_torch_state_dict(sd, out)
    print(f"exported {len(sd)} tensors from {path} -> {out}")


if __name__ == "__main__":
    main()
