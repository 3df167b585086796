#!/usr/bin/env python
"""Production-style txt2img HTTP server with request batching.

Serving shape: the model is built and jitted once at startup; a single batcher
thread owns the (single-tenant) accelerator. Incoming requests enqueue; the
batcher groups same-signature requests (image_size, steps, sampler, guidance)
arriving within a short window, pads the group to a power-of-two bucket
(bounded compile-cache growth), runs ONE batched sampling program, and fans the
images back out. Per-request seeds drive per-row init noise, so a request's
image is identical whether it was served solo or co-batched (ddim default;
stochastic samplers share the in-loop key across a batch).

API:
    GET  /healthz                    -> {"status": "ok", "queue_depth": N, ...}
    POST /txt2img  {"prompt": ...}   -> image/png
        optional fields: negative_prompt, steps, guidance_scale, seed,
        sampler (ddim|ddpm|dpmpp), image_size

Example:
    python scripts/serve.py --port 8500 --max-batch 4 &
    curl -X POST localhost:8500/txt2img -d '{"prompt": "a cat"}' -o cat.png
"""

import io
import json
import logging
import os
import queue
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
    max_batch: int = field(
        default=4, metadata={"help": "max requests fused into one device batch."}
    )
    batch_window_ms: int = field(
        default=20,
        metadata={"help": "how long the batcher waits for same-signature requests."},
    )
    warmup: bool = field(
        default=False,
        metadata={"help": "compile the default request signature at startup."},
    )


class _Pending:
    __slots__ = ("req", "event", "result", "error")

    def __init__(self, req: dict):
        self.req = req
        self.event = threading.Event()
        self.result = None
        self.error = None


def _signature(req: dict, cfg) -> tuple:
    return (
        int(req.get("image_size", cfg.serve.default_image_size)),
        int(req.get("steps", cfg.serve.default_steps)),
        str(req.get("sampler", "ddim")),
        float(req.get("guidance_scale", cfg.train.guidance_scale)),
    )


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class SDService:
    """Model owner: builds once; one batcher thread drives the device."""

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
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self.requests_served = 0
        self.batches_run = 0
        self._shutdown = False
        self.batcher = threading.Thread(target=self._batch_loop, daemon=True)
        self.batcher.start()

    # ------------------------------------------------------------------ #
    # batcher
    # ------------------------------------------------------------------ #

    def _batch_loop(self) -> None:
        window_s = self.cfg.serve.batch_window_ms / 1000.0
        max_batch = self.cfg.serve.max_batch
        while not self._shutdown:
            try:
                first = self.queue.get(timeout=0.2)
            except queue.Empty:
                continue
            if first is None:  # shutdown sentinel
                break
            sig = _signature(first.req, self.cfg)
            group = [first]
            deferred = []
            deadline = window_s
            # collect same-signature requests within the batching window
            while len(group) < max_batch:
                try:
                    nxt = self.queue.get(timeout=deadline)
                except queue.Empty:
                    break
                if nxt is None:
                    self._shutdown = True
                    break
                if _signature(nxt.req, self.cfg) == sig:
                    group.append(nxt)
                else:
                    deferred.append(nxt)
            for d in deferred:  # different signature: back on the queue
                self.queue.put(d)
            self._run_group(sig, group)

    def _run_group(self, sig: tuple, group: list) -> None:
        from stable_diffusion_pytorch_tpu.pipeline import sample

        image_size, steps, sampler, guidance = sig
        bucket = _bucket(len(group), self.cfg.serve.max_batch)
        prompts = [str(p.req.get("prompt", "")) for p in group]
        seeds = [int(p.req.get("seed", self.cfg.train.seed)) for p in group]
        # pad to the bucket so the compile cache stays bounded (pow-2 buckets)
        while len(prompts) < bucket:
            prompts.append(prompts[0])
            seeds.append(seeds[0])
        negative = str(group[0].req.get("negative_prompt", ""))
        try:
            outs = sample(
                self.model,
                image_size=image_size,
                prompt=prompts,
                negative_prompt=negative,
                time_steps=steps,
                guidance_scale=guidance,
                sampler=sampler,
                seed=seeds,
                save_dir=None,
            )
            for pending, img in zip(group, outs):
                pending.result = img
                pending.event.set()
            self.requests_served += len(group)
            self.batches_run += 1
            if len(group) > 1:
                logger.info(
                    f"batched {len(group)} requests (bucket {bucket}, sig {sig})"
                )
        except Exception as e:  # noqa: BLE001 — fan the error out, keep serving
            logger.exception("batch failed")
            for pending in group:
                pending.error = e
                pending.event.set()

    # ------------------------------------------------------------------ #
    # request surface
    # ------------------------------------------------------------------ #

    def txt2img_png(self, req: dict, timeout: float = 600.0) -> bytes:
        from PIL import Image

        pending = _Pending(req)
        self.queue.put(pending)
        if not pending.event.wait(timeout):
            raise TimeoutError("sampling timed out")
        if pending.error is not None:
            raise pending.error
        buf = io.BytesIO()
        Image.fromarray(pending.result).save(buf, format="PNG")
        return buf.getvalue()

    def stop(self) -> None:
        self._shutdown = True
        self.queue.put(None)


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
                        "batches_run": service.batches_run,
                        "queue_depth": service.queue.qsize(),
                        "max_batch": service.cfg.serve.max_batch,
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
        service.stop()
        server.shutdown()


if __name__ == "__main__":
    main()
