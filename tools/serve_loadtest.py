#!/usr/bin/env python
"""Load test for scripts/serve.py: p50/p95 latency + throughput, batching
on vs off, and checkpoint hot-swap under load.

The one subsystem whose purpose is latency/throughput needs numbers
(round-3 verdict): this drives the REAL HTTP server (ThreadingHTTPServer +
batcher thread + jitted sampler) with concurrent clients on a tiny model.

Protocol (each phase warmed up so compiles are excluded from timing):
  1. batching ON  (max_batch=MB): C concurrent clients, N requests total
  2. batching OFF (max_batch=1): same load, fresh service
  3. hot-swap under load: phase-1 service, /reload fired mid-stream —
     every request must still succeed (the swap is atomic between batches)

Prints ONE JSON line. Env knobs: LT_CLIENTS (8), LT_REQUESTS (32),
LT_STEPS (6), LT_SIZE (32), LT_MAX_BATCH (8).

CPU-runnable (JAX_PLATFORMS=cpu is forced unless LT_PLATFORM overrides);
absolute numbers on one CPU core are not TPU numbers — the point is the
batching-on/off RATIO and the p50/p95 shape, which transfer.
"""

import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scripts"))

os.environ["JAX_PLATFORMS"] = os.environ.get("LT_PLATFORM", "cpu")

TINY = [
    "--channels-list", "16,32", "--n-heads", "4", "--time-emb-dim", "32",
    "--n-layers", "1", "--autoencoder-channels-list", "8,16", "--groups", "4",
    "--noise-steps", "20",
]

# LT_PRESET=sd15 serves the full SD-1.5-scale stack (models/presets.py) —
# pair with LT_PLATFORM=axon LT_STEPS=50 LT_SIZE=512 for real-chip serving
# latency (the TPU is single-tenant: nothing else may hold the chip)
SD15 = [
    "--channels-list", "320,640,1280,1280", "--n-heads", "8",
    "--time-emb-dim", "1280", "--n-layers", "1",
    "--attention-resolutions", "1,2,4", "--context-dim", "768",
    "--autoencoder-channels-list", "128,256,512,512", "--groups", "32",
    "--noise-steps", "1000",
]


def _model_args():
    return SD15 if os.environ.get("LT_PRESET") == "sd15" else TINY


def _post(url: str, payload: dict, timeout: float = 600.0):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, resp.read()


def _percentile(xs, p):
    xs = sorted(xs)
    if not xs:
        return None
    k = min(len(xs) - 1, max(0, int(round(p / 100.0 * (len(xs) - 1)))))
    return xs[k]


class _Server:
    def __init__(self, max_batch: int, steps: int, size: int):
        import serve as serve_mod

        self.serve_mod = serve_mod
        argv = _model_args() + [
            "--default-image-size", str(size), "--default-steps", str(steps),
            "--max-batch", str(max_batch), "--batch-window-ms", "30",
        ]
        self.service, self.cfg = serve_mod.build_service(argv)
        self.httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0), serve_mod.make_handler(self.service)
        )
        self.url = f"http://127.0.0.1:{self.httpd.server_address[1]}"
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.httpd.shutdown()
        self.service.stop()


def _run_load(url: str, n_requests: int, n_clients: int, tag: str):
    """Fire n_requests from n_clients concurrent workers; return latencies."""
    lat: list = []
    errors: list = []
    lock = threading.Lock()
    idx = {"i": 0}

    def worker(cid: int):
        while True:
            with lock:
                i = idx["i"]
                if i >= n_requests:
                    return
                idx["i"] = i + 1
            t0 = time.perf_counter()
            try:
                status, body = _post(
                    url + "/txt2img",
                    {"prompt": f"{tag} {i}", "seed": 1000 + i},
                )
                dt = time.perf_counter() - t0
                with lock:
                    if status != 200 or body[:4] != b"\x89PNG":
                        errors.append(f"req {i}: status {status}")
                    else:
                        lat.append(dt)
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(f"req {i}: {type(e).__name__}: {e}")

    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker, args=(c,)) for c in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    return lat, errors, wall


def _phase(max_batch: int, steps: int, size: int, n_requests: int,
           n_clients: int, warm_requests: int):
    srv = _Server(max_batch, steps, size)
    try:
        # warmup: compile every pow-2 bucket this load can hit (solo request
        # covers bucket 1; a concurrent burst covers the larger buckets)
        _post(srv.url + "/txt2img", {"prompt": "warm", "seed": 1})
        _run_load(srv.url, warm_requests, n_clients, "warm")
        lat, errors, wall = _run_load(srv.url, n_requests, n_clients, "load")
        with urllib.request.urlopen(srv.url + "/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        return {
            "max_batch": max_batch,
            "requests": n_requests,
            "clients": n_clients,
            "ok": len(lat),
            "errors": errors[:5],
            "p50_s": round(_percentile(lat, 50), 3) if lat else None,
            "p95_s": round(_percentile(lat, 95), 3) if lat else None,
            "req_per_s": round(len(lat) / wall, 3) if wall else None,
            "batches_run": health["batches_run"],
            "requests_served": health["requests_served"],
        }
    finally:
        srv.close()


def _hot_swap_under_load(steps: int, size: int, n_clients: int, tmpdir: str):
    """Fire a /reload mid-stream; every sampling request must still succeed
    and the swap must actually change the output image."""
    import jax

    srv = _Server(max_batch=4, steps=steps, size=size)
    try:
        _post(srv.url + "/txt2img", {"prompt": "warm", "seed": 1})
        # reference image pre-swap
        _, img_before = _post(srv.url + "/txt2img", {"prompt": "probe", "seed": 42})

        # stage a perturbed checkpoint (real save path: utils/checkpoint)
        from stable_diffusion_pytorch_tpu.utils.checkpoint import save_checkpoint

        params = srv.service.model.unet_params
        bumped = jax.tree_util.tree_map(lambda x: x + 0.01, params)
        ckpt = os.path.join(tmpdir, "checkpoint-7")
        save_checkpoint(ckpt, {"params": bumped})

        results = {"errors": [], "lat": []}
        lock = threading.Lock()
        stop = threading.Event()

        def client(cid: int):
            i = 0
            while not stop.is_set():
                t0 = time.perf_counter()
                try:
                    status, body = _post(
                        srv.url + "/txt2img",
                        {"prompt": f"swapload {cid}", "seed": cid * 100 + i},
                        timeout=120,
                    )
                    with lock:
                        if status != 200 or body[:4] != b"\x89PNG":
                            results["errors"].append(f"{cid}/{i}: {status}")
                        else:
                            results["lat"].append(time.perf_counter() - t0)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        results["errors"].append(f"{cid}/{i}: {type(e).__name__}")
                i += 1

        threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
        for t in threads:
            t.start()
        try:
            time.sleep(1.0)  # load flowing
            t_swap0 = time.perf_counter()
            status, body = _post(srv.url + "/reload", {"unet_checkpoint": ckpt})
            swap_s = time.perf_counter() - t_swap0
            reload_ok = status == 200 and json.loads(body)["status"] == "reloaded"
            time.sleep(1.0)  # load continues post-swap
        finally:
            # a failed /reload must still release the client threads — they
            # are non-daemon and would spin (and grow errors[]) forever
            stop.set()
        for t in threads:
            t.join(timeout=300)

        _, img_after = _post(srv.url + "/txt2img", {"prompt": "probe", "seed": 42})
        return {
            "reload_ok": bool(reload_ok),
            "reload_latency_s": round(swap_s, 3),
            "requests_ok": len(results["lat"]),
            "errors": results["errors"][:5],
            "p95_during_swap_s": (
                round(_percentile(results["lat"], 95), 3) if results["lat"] else None
            ),
            "weights_changed_output": img_before != img_after,
        }
    finally:
        srv.close()


def main() -> dict:
    import tempfile

    from stable_diffusion_pytorch_tpu.utils.platform import ensure_platform

    ensure_platform()

    clients = int(os.environ.get("LT_CLIENTS", "8"))
    n_requests = int(os.environ.get("LT_REQUESTS", "32"))
    steps = int(os.environ.get("LT_STEPS", "6"))
    size = int(os.environ.get("LT_SIZE", "32"))
    max_batch = int(os.environ.get("LT_MAX_BATCH", "8"))

    on = _phase(max_batch, steps, size, n_requests, clients,
                warm_requests=max(clients, 8))
    off = _phase(1, steps, size, n_requests, clients,
                 warm_requests=max(clients, 8))
    if os.environ.get("LT_SKIP_SWAP") == "1":
        swap = "skipped (LT_SKIP_SWAP=1)"
    else:
        try:
            with tempfile.TemporaryDirectory() as td:
                swap = _hot_swap_under_load(steps, size, clients, td)
        except Exception as e:  # noqa: BLE001 — keep the latency phases
            swap = f"FAILED: {type(e).__name__}: {e}"

    result = {
        "metric": "serve_loadtest",
        "steps": steps,
        "image_size": size,
        "batching_on": on,
        "batching_off": off,
        "batching_speedup": (
            round(on["req_per_s"] / off["req_per_s"], 2)
            if on["req_per_s"] and off["req_per_s"] else None
        ),
        "hot_swap_under_load": swap,
    }
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
