"""3D-viewer server wire protocol (reference run_3dviewer.py:563-707):
in-process ThreadingHTTPServer on a tiny model; asserts the /frame/N header
sizes and 24-bit depth round-trip, /get-source-info JSON, /upload source swap,
and 404 on non-whitelisted paths."""

import json
import os.path as osp
import re
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
    # alpha = inverted blurred-Sobel edge magnitude (reference MaskData
    # compute_edges_uint8): full range, max where depth is flat
    alpha = depth_img[..., 3]
    assert alpha.max() == 255 and alpha.min() < 255  # some edge somewhere
    # flat regions (low |grad|) should dominate for a smooth-ish depth map
    assert (alpha > 127).mean() > 0.5


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


@pytest.fixture(scope="module")
def model_and_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("viewer2")
    sd = random_original_depth_anything_state_dict(TINY, seed=11)
    ckpt = str(d / "depth_anything_v2_tiny.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, ckpt)
    _, model = make_dpt_from_state_dict(ckpt)
    return model, d


def _serve(model, source, **handler_kw):
    handler = run_3dviewer.make_handler(model, source, max_side=112, is_metric=False, **handler_kw)
    httpd = ThreadingHTTPServer(("localhost", 0), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://localhost:{httpd.server_address[1]}"


def test_loaded_mask_roundtrips_through_frame_alpha(model_and_dir):
    """--mask_path: the loaded mask (resized to the depth shape) must arrive
    verbatim in /frame/N's alpha channel (reference run_3dviewer.py:50-55,
    MaskData :395-455)."""
    model, d = model_and_dir
    img = np.random.default_rng(1).integers(0, 256, (96, 128, 3), dtype=np.uint8)
    img_path = str(d / "input.png")
    cv2.imwrite(img_path, img)

    mask = np.zeros((96, 128), np.uint8)
    cv2.circle(mask, (64, 48), 30, 255, -1)
    mask_path = str(d / "mask.png")
    cv2.imwrite(mask_path, mask)

    source = run_3dviewer.InputSource(img_path)
    httpd, base = _serve(model, source, mask=run_3dviewer.MaskSource(mask_path))
    try:
        status, headers, body = _get(base + "/frame/0")
        assert status == 200
        depth_img = cv2.imdecode(np.frombuffer(body[int(headers["X-rgb-size"]) :], np.uint8), cv2.IMREAD_UNCHANGED)
        expected = cv2.resize(mask, (depth_img.shape[1], depth_img.shape[0]))
        np.testing.assert_array_equal(depth_img[..., 3], expected)
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_cropped_video_serves_cropped_frames(model_and_dir):
    """--crop on a video input: frames are cropped before inference and the
    served RGB/depth reflect the crop (reference run_3dviewer.py:197-215,
    361-377)."""
    model, d = model_and_dir
    vid_path = str(d / "clip.avi")
    vw = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (128, 96))
    assert vw.isOpened()
    rng = np.random.default_rng(3)
    for _ in range(4):
        vw.write(rng.integers(0, 256, (96, 128, 3), dtype=np.uint8))
    vw.release()

    crop = run_3dviewer.CropState(((0.25, 0.25), (0.75, 0.75)))
    assert crop.is_cropping()
    source = run_3dviewer.InputSource(vid_path)
    httpd, base = _serve(model, source, crop=crop)
    try:
        info = json.loads(_get(base + "/get-source-info")[2])
        assert info["type"] == "video" and info["frame_count"] == 4
        status, headers, body = _get(base + "/frame/2")
        assert status == 200
        rgb = cv2.imdecode(np.frombuffer(body[: int(headers["X-rgb-size"])], np.uint8), cv2.IMREAD_COLOR)
        assert rgb.shape == (48, 64, 3)  # cropped half-size frame
        depth_img = cv2.imdecode(np.frombuffer(body[int(headers["X-rgb-size"]) :], np.uint8), cv2.IMREAD_UNCHANGED)
        assert depth_img is not None and depth_img.shape[2] == 4
    finally:
        httpd.shutdown()
        httpd.server_close()


# ---------------------------------------------------------------------------
# Client-side static consistency (no JS engine in this environment: validate
# that the JS<->HTML<->GLSL wiring is coherent without executing it)

VIEWER_DIR = osp.join(REPO_ROOT, "muggled_dpt_tpu", "demo_helpers", "viewer3d")


def _strip_js(src: str) -> str:
    """Remove string literals (keeping their spans empty) and comments, so
    delimiter balancing isn't confused by quoted braces."""
    out, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if c in "'\"`":
            q, i = c, i + 1
            while i < n and src[i] != q:
                i += 2 if src[i] == "\\" else 1
            i += 1
        elif src.startswith("//", i):
            while i < n and src[i] != "\n":
                i += 1
        elif src.startswith("/*", i):
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def test_viewer_js_delimiters_balance():
    src = open(osp.join(VIEWER_DIR, "viewer.js")).read()
    stripped = _strip_js(src)
    for op, cl in ("()", "{}", "[]"):
        assert stripped.count(op) == stripped.count(cl), f"unbalanced {op}{cl}"
    assert "function" in stripped  # sanity: stripping didn't eat code


def test_viewer_dom_ids_exist_in_html():
    js = open(osp.join(VIEWER_DIR, "viewer.js")).read()
    html = open(osp.join(VIEWER_DIR, "index.html")).read()
    wanted = set(re.findall(r"getElementById\(\"([^\"]+)\"\)", js))
    have = set(re.findall(r"id=\"([^\"]+)\"", html))
    missing = wanted - have
    assert not missing, f"JS references DOM ids missing from index.html: {missing}"


def test_viewer_shader_uniforms_declared():
    js = open(osp.join(VIEWER_DIR, "viewer.js")).read()
    shader_src = "\n".join(re.findall(r"`([^`]*)`", js))
    declared_u = set(re.findall(r"uniform\s+\w+\s+([\w,\s]+);", shader_src))
    declared_u = {name.strip() for group in declared_u for name in group.split(",")}
    declared_a = set(re.findall(r"attribute\s+\w+\s+(\w+);", shader_src))
    for u in set(re.findall(r"getUniformLocation\(\w+,\s*\"(\w+)\"\)", js)):
        assert u in declared_u, f"uniform {u} not declared in any shader"
    for a in set(re.findall(r"getAttribLocation\(\w+,\s*\"(\w+)\"\)", js)):
        assert a in declared_a, f"attribute {a} not declared in any shader"
