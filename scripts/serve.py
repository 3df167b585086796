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
    POST /txt2img  {"prompt": ...}   -> image/png (synchronous)
        optional fields: negative_prompt, steps, guidance_scale, seed,
        sampler (any of latent_diffusion.SAMPLERS), karras, image_size
    POST /txt2img_async {...}        -> {"request_id": "..."} (returns at once)
    GET  /progress/<request_id>      -> {"state": queued|running|done|error,
                                         "pct": 0..1, "queue_position": N}
    GET  /result/<request_id>        -> image/png when done (202 JSON before)
    POST /reload {"unet_checkpoint": path[, "lora_checkpoint", "lora_scale"]}
         -> {"status": "reloaded", ...}  — checkpoint HOT-SWAP: the new UNet
         weights take effect between batches with zero downtime (params are
         sampler ARGUMENTS, so no recompilation; the swap runs on the batcher
         thread, which owns the device, making it atomic wrt in-flight work)

Progress is estimated host-side from an EMA of previous runs of the same
request signature: the sampling loop is ONE XLA program on the device, so
per-step host callbacks would stall the TPU pipeline — an ETA-based estimate
is free and accurate after the first batch of a signature.

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
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

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
    warmup_sizes: Optional[List[int]] = field(
        default=None,
        metadata={
            "help": "extra image resolutions to compile at startup (e.g. "
            "64,128,256) so the first request at each size pays no compile."
        },
    )


class _Pending:
    __slots__ = (
        "req", "event", "result", "error",
        "id", "state", "submit_time", "start_time", "done_time", "sig",
    )

    def __init__(self, req: dict):
        self.req = req
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.id = uuid.uuid4().hex
        self.state = "queued"
        self.submit_time = time.time()
        self.start_time = None
        self.done_time = None
        self.sig = None


class _ReloadJob:
    """Checkpoint hot-swap request; executed by the batcher thread (the sole
    owner of the model/device) so it interleaves atomically between batches."""

    __slots__ = ("req", "event", "error")

    def __init__(self, req: dict):
        self.req = req
        self.event = threading.Event()
        self.error = None


def _signature(req: dict, cfg) -> tuple:
    return (
        int(req.get("image_size", cfg.serve.default_image_size)),
        int(req.get("steps", cfg.serve.default_steps)),
        str(req.get("sampler", "ddim")),
        float(req.get("guidance_scale", cfg.train.guidance_scale)),
        bool(req.get("karras", False)),
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
        self.reloads = 0
        self.current_checkpoint = None  # init weights until /reload
        self._shutdown = False
        # async-API request tracking + per-signature duration EMA for progress
        self.jobs: dict = {}
        self._jobs_lock = threading.Lock()
        self._sig_ema: dict = {}
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
            if isinstance(first, _ReloadJob):
                self._do_reload(first)
                continue
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
                if isinstance(nxt, _ReloadJob):
                    deferred.append(nxt)  # swap after the current batch
                elif _signature(nxt.req, self.cfg) == sig:
                    group.append(nxt)
                else:
                    deferred.append(nxt)
            for d in deferred:  # different signature: back on the queue
                self.queue.put(d)
            self._run_group(sig, group)

    def _run_group(self, sig: tuple, group: list) -> None:
        from stable_diffusion_pytorch_tpu.pipeline import sample

        image_size, steps, sampler, guidance, karras = sig
        bucket = _bucket(len(group), self.cfg.serve.max_batch)
        prompts = [str(p.req.get("prompt", "")) for p in group]
        seeds = [int(p.req.get("seed", self.cfg.train.seed)) for p in group]
        # pad to the bucket so the compile cache stays bounded (pow-2 buckets)
        while len(prompts) < bucket:
            prompts.append(prompts[0])
            seeds.append(seeds[0])
        negative = str(group[0].req.get("negative_prompt", ""))
        t_start = time.time()
        for pending in group:
            pending.state = "running"
            pending.start_time = t_start
            pending.sig = sig
        try:
            outs = sample(
                self.model,
                image_size=image_size,
                prompt=prompts,
                negative_prompt=negative,
                time_steps=steps,
                guidance_scale=guidance,
                sampler=sampler,
                karras=karras,
                seed=seeds,
                save_dir=None,
            )
            now = time.time()
            for pending, img in zip(group, outs):
                pending.result = img
                pending.state = "done"
                pending.done_time = now
                pending.event.set()
            # EMA of per-signature batch duration (drives /progress estimates);
            # the first, compile-bearing run seeds the EMA and is then washed
            # out by subsequent steady-state runs
            dur = now - t_start
            prev = self._sig_ema.get(sig)
            self._sig_ema[sig] = dur if prev is None else 0.7 * prev + 0.3 * dur
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
                pending.state = "error"
                pending.done_time = time.time()
                pending.event.set()

    def _do_reload(self, job: "_ReloadJob") -> None:
        """Swap UNet weights in place. Params are sampler ARGUMENTS (not baked
        into the compiled programs), so the jit cache stays warm — the swap
        costs one host->device transfer, with zero recompilation."""
        try:
            from stable_diffusion_pytorch_tpu.utils.checkpoint import (
                find_latest_checkpoint,
                load_params_for_inference,
            )

            path = job.req["unet_checkpoint"]
            if os.path.isdir(path) and not os.path.basename(path).startswith(
                ("checkpoint", "epoch")
            ):
                path = find_latest_checkpoint(path) or path
            params = load_params_for_inference(path)
            lora = job.req.get("lora_checkpoint")
            if lora:
                from stable_diffusion_pytorch_tpu.models.lora import merge_lora

                lpath = lora
                if os.path.isdir(lpath) and not os.path.basename(lpath).startswith(
                    ("checkpoint", "epoch")
                ):
                    lpath = find_latest_checkpoint(lpath) or lpath
                params = merge_lora(
                    params,
                    load_params_for_inference(lpath),
                    float(job.req.get("lora_scale", 1.0)),
                )
            self.model.unet_params = params
            self.current_checkpoint = path
            self.reloads += 1
            logger.info(f"hot-swapped UNet weights from {path}")
        except Exception as e:  # noqa: BLE001 — report to the caller, keep serving
            logger.exception("reload failed")
            job.error = e
        finally:
            job.event.set()

    def reload(self, req: dict, timeout: float = 600.0) -> str:
        assert "unet_checkpoint" in req, "reload needs 'unet_checkpoint'"
        job = _ReloadJob(req)
        self.queue.put(job)
        if not job.event.wait(timeout):
            raise TimeoutError("reload timed out")
        if job.error is not None:
            raise job.error
        return self.current_checkpoint

    # ------------------------------------------------------------------ #
    # request surface
    # ------------------------------------------------------------------ #

    def _submit(self, req: dict) -> "_Pending":
        pending = _Pending(req)
        with self._jobs_lock:
            # prune finished jobs older than 10 minutes so the table is bounded
            cutoff = time.time() - 600.0
            for jid in [
                j
                for j, p in self.jobs.items()
                if p.done_time is not None and p.done_time < cutoff
            ]:
                del self.jobs[jid]
            self.jobs[pending.id] = pending
        self.queue.put(pending)
        return pending

    @staticmethod
    def _to_png(pending: "_Pending") -> bytes:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(pending.result).save(buf, format="PNG")
        return buf.getvalue()

    def txt2img_png(self, req: dict, timeout: float = 600.0) -> bytes:
        pending = self._submit(req)
        if not pending.event.wait(timeout):
            raise TimeoutError("sampling timed out")
        if pending.error is not None:
            raise pending.error
        return self._to_png(pending)

    def submit_async(self, req: dict) -> str:
        return self._submit(req).id

    def progress(self, request_id: str) -> Optional[dict]:
        with self._jobs_lock:
            pending = self.jobs.get(request_id)
        if pending is None:
            return None
        info = {"state": pending.state, "request_id": request_id}
        if pending.state == "queued":
            with self._jobs_lock:
                info["queue_position"] = sum(
                    1
                    for p in self.jobs.values()
                    if p.state == "queued" and p.submit_time < pending.submit_time
                )
            info["pct"] = 0.0
        elif pending.state == "running":
            ema = self._sig_ema.get(pending.sig)
            if ema:
                info["pct"] = min(0.95, (time.time() - pending.start_time) / ema)
            else:  # first run of this signature: compile time dominates, unknown
                info["pct"] = None
        elif pending.state == "done":
            info["pct"] = 1.0
        else:  # error
            info["pct"] = 1.0
            info["error"] = f"{type(pending.error).__name__}: {pending.error}"
        return info

    def result_png(self, request_id: str) -> Optional["_Pending"]:
        with self._jobs_lock:
            return self.jobs.get(request_id)

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
            from stable_diffusion_pytorch_tpu.models.latent_diffusion import SAMPLERS

            if self.path == "/healthz":
                payload = json.dumps(
                    {
                        "status": "ok",
                        "requests_served": service.requests_served,
                        "batches_run": service.batches_run,
                        "queue_depth": service.queue.qsize(),
                        "jobs_tracked": len(service.jobs),
                        "max_batch": service.cfg.serve.max_batch,
                        "samplers": list(SAMPLERS),
                        "checkpoint": service.current_checkpoint,
                        "reloads": service.reloads,
                    }
                ).encode()
                self._send(200, payload, "application/json")
            elif self.path.startswith("/progress/"):
                info = service.progress(self.path[len("/progress/"):])
                if info is None:
                    self._send(
                        404, b'{"error": "unknown request_id"}', "application/json"
                    )
                else:
                    self._send(200, json.dumps(info).encode(), "application/json")
            elif self.path.startswith("/result/"):
                pending = service.result_png(self.path[len("/result/"):])
                if pending is None:
                    self._send(
                        404, b'{"error": "unknown request_id"}', "application/json"
                    )
                elif pending.state == "done":
                    self._send(200, service._to_png(pending), "image/png")
                elif pending.state == "error":
                    self._send(
                        500,
                        json.dumps(
                            {"error": f"{type(pending.error).__name__}: {pending.error}"}
                        ).encode(),
                        "application/json",
                    )
                else:  # still queued/running: 202 Accepted + progress body
                    self._send(
                        202,
                        json.dumps(service.progress(pending.id)).encode(),
                        "application/json",
                    )
            else:
                self._send(404, b'{"error": "not found"}', "application/json")

        def do_POST(self):
            from stable_diffusion_pytorch_tpu.models.latent_diffusion import SAMPLERS

            if self.path not in ("/txt2img", "/txt2img_async", "/reload"):
                self._send(404, b'{"error": "not found"}', "application/json")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/reload":
                    path = service.reload(req)
                    self._send(
                        200,
                        json.dumps(
                            {"status": "reloaded", "checkpoint": path,
                             "reloads": service.reloads}
                        ).encode(),
                        "application/json",
                    )
                    return
                if req.get("sampler", "ddim") not in SAMPLERS:
                    raise ValueError(f"unknown sampler {req.get('sampler')!r}")
                if self.path == "/txt2img_async":
                    rid = service.submit_async(req)
                    self._send(
                        202,
                        json.dumps({"request_id": rid}).encode(),
                        "application/json",
                    )
                else:
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
    for size in cfg.serve.warmup_sizes or []:
        logger.info(f"warmup: compiling image_size={size}...")
        service.txt2img_png(
            {"prompt": "warmup", "steps": cfg.serve.default_steps,
             "image_size": int(size)}
        )

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
