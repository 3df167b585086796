#!/usr/bin/env python
"""CLIP-score evaluation CLI (Hessel et al. 2021): text-image alignment of
generated images. No reference counterpart — eval-capability extension next to
FID (tools/fid_eval.py).

Usage:
    python tools/clip_score.py --images-dir output/ --prompt "a cat"
    python tools/clip_score.py --images-dir output/ --prompts-file prompts.txt
Weights: stage a full HF CLIPModel (e.g. openai/clip-vit-large-patch14) at
data/pretrained/clip_full/model.safetensors; offline runs warn and use random
weights (machinery check only).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.platform import ensure_platform

    ensure_platform()

    import numpy as np

    parser = argparse.ArgumentParser()
    parser.add_argument("--images-dir", required=True)
    parser.add_argument("--prompt", default=None, help="one prompt for all images")
    parser.add_argument(
        "--prompts-file", default=None,
        help="one prompt per line, matched to sorted image filenames",
    )
    parser.add_argument("--model-dir", default="data/pretrained")
    ns = parser.parse_args(argv)

    from PIL import Image

    from stable_diffusion_pytorch_tpu.models.clip import ClipConfig, _resolve_tokenizer
    from stable_diffusion_pytorch_tpu.models.clip_vision import CLIPScorer

    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    files = sorted(
        f for f in os.listdir(ns.images_dir) if f.lower().endswith(exts)
    )
    assert files, f"no images under {ns.images_dir!r}"
    images = np.stack(
        [np.asarray(Image.open(os.path.join(ns.images_dir, f)).convert("RGB"))
         for f in files]
    )
    if ns.prompts_file:
        with open(ns.prompts_file) as f:
            prompts = [line.rstrip("\n") for line in f if line.strip()]
        assert len(prompts) >= len(files), "fewer prompts than images"
        prompts = prompts[: len(files)]
    else:
        assert ns.prompt, "pass --prompt or --prompts-file"
        prompts = [ns.prompt] * len(files)

    scorer = CLIPScorer(
        _resolve_tokenizer(ClipConfig(model_dir=ns.model_dir)),
        model_dir=ns.model_dir,
    )
    value = scorer.score(images, prompts)
    print(
        json.dumps(
            {
                "metric": "clip_score",
                "value": round(value, 4),
                "unit": "clip-score (0-100)",
                "num_images": len(files),
                "pretrained": scorer.pretrained,
            }
        )
    )


if __name__ == "__main__":
    main()
