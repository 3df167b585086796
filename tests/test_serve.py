"""Serving layer tests: real HTTP round-trips against the in-process server."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

TINY_ARGS = [
    "--channels-list", "16,32", "--n-heads", "4", "--time-emb-dim", "32",
    "--n-layers", "1", "--autoencoder-channels-list", "8,16", "--groups", "4",
    "--noise-steps", "20", "--default-image-size", "16", "--default-steps", "3",
    "--max-batch", "4", "--batch-window-ms", "200",
]


@pytest.fixture(scope="module")
def server_url():
    import sys

    sys.path.insert(0, "scripts")
    import serve as serve_mod

    service, cfg = serve_mod.build_service(TINY_ARGS)
    serve_mod._TEST_SERVICE = service  # exposed for white-box tests (hot-swap)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.make_handler(service))
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert "ddim" in body["samplers"]


def test_txt2img_returns_png_and_is_deterministic(server_url):
    status, ctype, body = _post(
        server_url + "/txt2img", {"prompt": "a red circle", "seed": 7}
    )
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    # same seed -> identical bytes; different seed -> different image
    _, _, body2 = _post(server_url + "/txt2img", {"prompt": "a red circle", "seed": 7})
    assert body2 == body
    _, _, body3 = _post(server_url + "/txt2img", {"prompt": "a red circle", "seed": 8})
    assert body3 != body


def test_concurrent_requests_are_batched_and_row_identical(server_url):
    """Same-signature concurrent requests fuse into one device batch, and each
    request's image is IDENTICAL to its solo render (per-row seeds)."""
    import urllib.request as _u

    seeds = [11, 12, 13, 14]
    solo = {}
    for s in seeds:  # sequential baselines (bucket-1 program)
        _, _, body = _post(server_url + "/txt2img", {"prompt": "a cat", "seed": s})
        solo[s] = body

    with _u.urlopen(server_url + "/healthz", timeout=30) as resp:
        before = json.loads(resp.read())

    results = {}
    def worker(s):
        _, _, body = _post(server_url + "/txt2img", {"prompt": "a cat", "seed": s})
        results[s] = body

    threads = [threading.Thread(target=worker, args=(s,)) for s in seeds]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)

    with _u.urlopen(server_url + "/healthz", timeout=30) as resp:
        after = json.loads(resp.read())

    assert after["requests_served"] - before["requests_served"] == 4
    batches = after["batches_run"] - before["batches_run"]
    assert batches < 4, f"no batching happened ({batches} batches for 4 requests)"
    for s in seeds:
        assert results[s] == solo[s], f"seed {s}: batched image != solo image"


def test_bad_sampler_is_400_json(server_url):
    status, ctype, body = _post(
        server_url + "/txt2img", {"prompt": "x", "sampler": "bogus"}
    )
    assert status == 400 and ctype == "application/json"
    assert "unknown sampler" in json.loads(body)["error"]


def test_unknown_route_404(server_url):
    status, _, _ = _post(server_url + "/nope", {})
    assert status == 404


def test_async_submit_progress_result(server_url):
    """POST /txt2img_async returns a request_id immediately; /progress tracks
    queued->running->done; /result serves the PNG (202 before completion)."""
    import time

    req = urllib.request.Request(
        server_url + "/txt2img_async",
        data=json.dumps({"prompt": "async cat", "seed": 3}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 202
        rid = json.loads(resp.read())["request_id"]

    # poll progress until done
    deadline = time.time() + 600
    state = None
    while time.time() < deadline:
        with urllib.request.urlopen(
            server_url + f"/progress/{rid}", timeout=30
        ) as resp:
            info = json.loads(resp.read())
        state = info["state"]
        assert state in ("queued", "running", "done")
        if state == "done":
            assert info["pct"] == 1.0
            break
        time.sleep(0.2)
    assert state == "done"

    status, ctype, body = _get(server_url + f"/result/{rid}")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"

    # the async result matches the synchronous path for the same seed
    _, _, sync_body = _post(
        server_url + "/txt2img", {"prompt": "async cat", "seed": 3}
    )
    assert body == sync_body


def test_progress_unknown_id_404(server_url):
    status, _, body = _get(server_url + "/progress/nope")
    assert status == 404 and b"unknown" in body


def test_new_samplers_accepted(server_url):
    status, ctype, body = _post(
        server_url + "/txt2img",
        {"prompt": "euler cat", "sampler": "euler", "karras": True, "seed": 1},
    )
    assert status == 200 and ctype == "image/png"


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=600) as resp:
            return resp.status, resp.headers.get("Content-Type"), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_reload_hot_swaps_weights(server_url, tmp_path):
    """POST /reload swaps UNet weights between batches: the same request
    (same seed) produces a DIFFERENT image afterwards, with no restart and no
    recompilation; /healthz reports the active checkpoint."""
    import jax
    import jax.numpy as jnp

    import serve as serve_mod
    from stable_diffusion_pytorch_tpu.utils.checkpoint import save_checkpoint

    service = serve_mod._TEST_SERVICE
    req = {"prompt": "a blue square", "seed": 11}
    _, _, before = _post(server_url + "/txt2img", req)

    # checkpoint with perturbed weights
    leaves, treedef = jax.tree_util.tree_flatten(service.model.unet_params)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    perturbed = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    ckpt = str(tmp_path / "swap" / "checkpoint-7")
    save_checkpoint(ckpt, {"params": perturbed})

    status, _, body = _post(
        server_url + "/reload", {"unet_checkpoint": str(tmp_path / "swap")}
    )
    assert status == 200
    info = json.loads(body)
    assert info["status"] == "reloaded"
    assert info["checkpoint"].endswith("checkpoint-7")

    _, _, after = _post(server_url + "/txt2img", req)
    assert after != before
    # identical request is still deterministic under the new weights
    _, _, after2 = _post(server_url + "/txt2img", req)
    assert after2 == after

    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["checkpoint"].endswith("checkpoint-7")
    assert health["reloads"] == 1

    # bad path -> error surfaced, serving continues
    status, _, body = _post(
        server_url + "/reload", {"unet_checkpoint": str(tmp_path / "missing")}
    )
    assert status == 400
    _, _, still = _post(server_url + "/txt2img", req)
    assert still == after
