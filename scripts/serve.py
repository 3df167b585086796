#!/usr/bin/env python
"""Minimal production-style txt2img HTTP server.

The framework's serving shape: the model is built and jitted once at startup;
requests of the same (size, steps, sampler, guidance) signature reuse the
compiled program (LatentDiffusion's jit cache). TPU access is serialized — the
chip is single-tenant — so requests are processed one at a time behind a lock.

API:
    GET  /healthz                    -> {"status": "ok", ...}
    POST /txt2img  {"prompt": ...}   -> image/png
        optional fields: negative_prompt, steps, guidance_scale, seed,
        sampler (ddim|ddpm|dpmpp), image_size

Example:
    python scripts/serve.py --port 8500 &
    curl -X POST localhost:8500/txt2img -d '{"prompt": "a cat"}' -o cat.png
"""

import io
import json
import logging
import os
import sys
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stable_diffusion_pytorch_tpu.config import BaseConfig  # noqa: E402

logging.basicConfig(
    format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
    datefmt="%m/%d/%Y %H:%M:%S",
    level=logging.INFO,
)
logger = logging.getLogger("serve")


@dataclass
class ServeConfig(BaseConfig):
    host: str = field(default="127.0.0.1", metadata={"help": "bind address."})
    port: int = field(default=8500, metadata={"help": "bind port."})
    default_steps: int = field(default=50, metadata={"help": "default sampling steps."})
    default_image_size: int = field(default=64, metadata={"help": "default resolution."})
    warmup: bool = field(
        default=False,
        metadata={"help": "compile the default request signature at startup."},
    )


class SDService:
    """Model owner: builds once, serializes device access, renders PNGs."""

    def __init__(self, cfg, compat, dtype):
        from stable_diffusion_pytorch_tpu.models.build import build_models

        self.cfg = cfg
        self.model = build_models(
            cfg.model,
            logger=logger,
            compat=compat,
            dtype=dtype,
            seed=cfg.train.seed,
            init_image_size=cfg.serve.default_image_size,
        )
        self.lock = threading.Lock()
        self.requests_served = 0

    def txt2img_png(self, req: dict) -> bytes:
        from PIL import Image

        from stable_diffusion_pytorch_tpu.pipeline import sample

        with self.lock:  # single-tenant accelerator
            outs = sample(
                self.model,
                image_size=int(req.get("image_size", self.cfg.serve.default_image_size)),
                prompt=str(req.get("prompt", "")),
                negative_prompt=str(req.get("negative_prompt", "")),
                time_steps=int(req.get("steps", self.cfg.serve.default_steps)),
                guidance_scale=float(
                    req.get("guidance_scale", self.cfg.train.guidance_scale)
                ),
                sampler=str(req.get("sampler", "ddim")),
                num_images=1,
                seed=int(req.get("seed", self.cfg.train.seed)),
                save_dir=None,
            )
            self.requests_served += 1
        buf = io.BytesIO()
        Image.fromarray(outs[0]).save(buf, format="PNG")
        return buf.getvalue()


def make_handler(service: SDService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.client_address[0], *args)

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                payload = json.dumps(
                    {
                        "status": "ok",
                        "requests_served": service.requests_served,
                        "samplers": ["ddim", "ddpm", "dpmpp"],
                    }
                ).encode()
                self._send(200, payload, "application/json")
            else:
                self._send(404, b'{"error": "not found"}', "application/json")

        def do_POST(self):
            if self.path != "/txt2img":
                self._send(404, b'{"error": "not found"}', "application/json")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if req.get("sampler", "ddim") not in ("ddim", "ddpm", "dpmpp"):
                    raise ValueError(f"unknown sampler {req.get('sampler')!r}")
                png = service.txt2img_png(req)
                self._send(200, png, "image/png")
            except Exception as e:  # surface errors as JSON, keep serving
                logger.exception("request failed")
                self._send(
                    400,
                    json.dumps({"error": f"{type(e).__name__}: {e}"}).encode(),
                    "application/json",
                )

    return Handler


def build_service(argv=None):
    from stable_diffusion_pytorch_tpu.config import compat_from_cfg, load_config
    from stable_diffusion_pytorch_tpu.models.build import resolve_dtype

    args, cfg = load_config(argv, extra_data_classes=[ServeConfig])
    compat = compat_from_cfg(cfg)
    dtype = resolve_dtype(cfg.parallel.mixed_precision)
    return SDService(cfg, compat, dtype), cfg


def main(argv=None):
    from stable_diffusion_pytorch_tpu.utils.platform import (
        enable_compilation_cache,
        ensure_platform,
    )

    ensure_platform()
    enable_compilation_cache()

    service, cfg = build_service(argv)
    if cfg.serve.warmup:
        logger.info("warmup: compiling the default request signature...")
        service.txt2img_png({"prompt": "warmup", "steps": cfg.serve.default_steps})

    server = ThreadingHTTPServer(
        (cfg.serve.host, cfg.serve.port), make_handler(service)
    )
    logger.info(f"serving on http://{cfg.serve.host}:{cfg.serve.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
        server.shutdown()


if __name__ == "__main__":
    main()
