"""3D-viewer server wire protocol (reference run_3dviewer.py:563-707):
in-process ThreadingHTTPServer on a tiny model; asserts the /frame/N header
sizes and 24-bit depth round-trip, /get-source-info JSON, /upload source swap,
and 404 on non-whitelisted paths."""

import json
import threading
import urllib.request
import urllib.error
from http.server import ThreadingHTTPServer

import cv2
import numpy as np
import pytest
import torch

from conftest import REPO_ROOT  # noqa: F401  (ensures repo root on sys.path)

import run_3dviewer
from muggled_dpt_tpu.checkpoints.random_init import random_original_depth_anything_state_dict
from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict

TINY = {
    "features_per_token": 64,
    "num_blocks": 4,
    "reassembly_features_list": [8, 16, 32, 64],
    "fusion_channels": 16,
    "patch_size_px": 14,
    "base_patch_grid_hw": (8, 8),
}


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("viewer")
    sd = random_original_depth_anything_state_dict(TINY, seed=11)
    ckpt = str(d / "depth_anything_v2_tiny.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    _, model = make_dpt_from_state_dict(ckpt)

    img = np.random.default_rng(1).integers(0, 256, (96, 128, 3), dtype=np.uint8)
    img_path = str(d / "input.png")
    cv2.imwrite(img_path, img)

    source = run_3dviewer.InputSource(img_path)
    handler = run_3dviewer.make_handler(model, source, max_side=112, is_metric=False)
    httpd = ThreadingHTTPServer(("localhost", 0), handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://localhost:{httpd.server_address[1]}"
    yield {"base": base, "source": source}
    httpd.shutdown()
    httpd.server_close()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, dict(r.headers), r.read()


def test_frame_headers_and_depth_roundtrip(server):
    status, headers, body = _get(server["base"] + "/frame/0")
    assert status == 200
    rgb_size = int(headers["X-rgb-size"])
    depth_size = int(headers["X-depth-size"])
    assert rgb_size + depth_size == len(body)

    rgb = cv2.imdecode(np.frombuffer(body[:rgb_size], np.uint8), cv2.IMREAD_COLOR)
    assert rgb is not None and rgb.shape == (96, 128, 3)

    depth_img = cv2.imdecode(np.frombuffer(body[rgb_size:], np.uint8), cv2.IMREAD_UNCHANGED)
    assert depth_img is not None and depth_img.ndim == 3 and depth_img.shape[2] == 4  # BGRA

    # 24-bit depth packed high->low into R,G,B (PNG is lossless, so the
    # normalized prediction must round-trip exactly: min 0, max 2^24-1)
    b, g, r = depth_img[..., 0].astype(np.uint32), depth_img[..., 1].astype(np.uint32), depth_img[..., 2].astype(np.uint32)
    d24 = (r << 16) | (g << 8) | b
    assert d24.min() == 0
    assert d24.max() == 2**24 - 1
    # alpha = Sobel edge mask: binary 0/255
    assert set(np.unique(depth_img[..., 3])) <= {0, 255}


def test_frame_bad_index(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server["base"] + "/frame/abc")
    assert e.value.code == 400


def test_source_info(server):
    status, _, body = _get(server["base"] + "/get-source-info")
    assert status == 200
    info = json.loads(body)
    assert info == {"type": "image", "frame_count": 1, "fps": 0.0, "is_metric": False}


def test_static_whitelist_and_404(server):
    status, headers, body = _get(server["base"] + "/")
    assert status == 200 and b"<html" in body.lower() and "text/html" in headers["Content-Type"]
    status, headers, _ = _get(server["base"] + "/viewer.js")
    assert status == 200 and "javascript" in headers["Content-Type"]
    for path in ("/secret.txt", "/../run_3dviewer.py", "/index.html.bak"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server["base"] + path)
        assert e.value.code == 404, path


def test_upload_swaps_source(server):
    new_img = np.full((64, 80, 3), 128, np.uint8)
    new_img[:32] = 30  # some structure
    ok, enc = cv2.imencode(".png", new_img)
    assert ok
    req = urllib.request.Request(server["base"] + "/upload", data=enc.tobytes(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200

    status, headers, body = _get(server["base"] + "/frame/0")
    rgb = cv2.imdecode(np.frombuffer(body[: int(headers["X-rgb-size"])], np.uint8), cv2.IMREAD_COLOR)
    assert rgb.shape == (64, 80, 3)  # now serving the uploaded image

    # bad upload -> 400, source unchanged
    req = urllib.request.Request(server["base"] + "/upload", data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=120)
    assert e.value.code == 400
