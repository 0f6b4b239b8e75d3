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
    status, headers, body = _get(server["base"] + "/info.html")
    assert status == 200 and b"Wire protocol" in body  # standalone docs page
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


def test_export_obj_and_glb_endpoints(server):
    """Headless mesh export: /export/obj parses as a valid OBJ grid mesh and
    /export/glb is a structurally valid binary glTF — this is the executable
    verification of the client's export math (same formulas,
    demo_helpers/mesh_export.py; no JS engine exists in this image)."""
    status, headers, body = _get(server["base"] + "/export/obj?grid=8&scale=0.5&offset=0.1")
    assert status == 200
    lines = body.decode().splitlines()
    n_side = 9
    vs = [l for l in lines if l.startswith("v ")]
    vts = [l for l in lines if l.startswith("vt ")]
    fs = [l for l in lines if l.startswith("f ")]
    assert len(vs) == n_side * n_side and len(vts) == n_side * n_side
    assert len(fs) == 8 * 8 * 2
    # z = scale*d + offset with d in [0,1] -> z bounded by [offset, scale+offset]
    zs = [float(l.split()[3]) for l in vs]
    assert min(zs) >= 0.1 - 1e-4 and max(zs) <= 0.6 + 1e-4
    # face indices are 1-based and in range
    first_face = fs[0].split()[1:]
    assert all(1 <= int(tok.split("/")[0]) <= n_side * n_side for tok in first_face)

    status, _, glb = _get(server["base"] + "/export/glb?grid=8")
    assert status == 200
    import struct as _struct

    magic, version, total = _struct.unpack_from("<III", glb, 0)
    assert magic == 0x46546C67 and version == 2 and total == len(glb)
    json_len, json_tag = _struct.unpack_from("<II", glb, 12)
    assert json_tag == 0x4E4F534A and json_len % 4 == 0
    gltf = json.loads(glb[20 : 20 + json_len])
    bin_len, bin_tag = _struct.unpack_from("<II", glb, 20 + json_len)
    assert bin_tag == 0x004E4942
    assert 20 + json_len + 8 + bin_len == total
    acc = gltf["accessors"]
    assert acc[0]["count"] == 81 and acc[0]["type"] == "VEC3" and acc[0]["componentType"] == 5126
    assert acc[2]["count"] == 8 * 8 * 6 and acc[2]["componentType"] == 5125
    assert gltf["buffers"][0]["byteLength"] == bin_len
    # positions decode from the BIN chunk and match the accessor min/max
    pos = np.frombuffer(glb, np.float32, count=81 * 3, offset=20 + json_len + 8).reshape(-1, 3)
    np.testing.assert_allclose(pos.min(axis=0), acc[0]["min"], rtol=1e-6)
    np.testing.assert_allclose(pos.max(axis=0), acc[0]["max"], rtol=1e-6)


def test_export_depth_range_clipping(server):
    """/export/obj honors dmin/dmax: the selected band remaps to 0..1 so the
    z range still spans [offset, scale+offset], and a degenerate band
    (dmin==dmax) flattens every vertex. Mirrors viewer.js:remapDepth."""
    from muggled_dpt_tpu.demo_helpers.mesh_export import build_mesh_arrays

    # unit-level: remap math matches clamp((d-lo)/max(hi-lo, 1e-3))
    d = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
    # grid == side-1: the vertex grid samples every pixel exactly once
    pos, _, _ = build_mesh_arrays(d, grid=3, scale=1.0, offset=0.0, dmin=0.25, dmax=0.75)
    np.testing.assert_allclose(pos[:, 2].reshape(4, 4), np.clip((d - 0.25) / 0.5, 0, 1), atol=1e-6)
    # swapped bounds behave like (lo, hi)
    pos_sw, _, _ = build_mesh_arrays(d, grid=3, scale=1.0, offset=0.0, dmin=0.75, dmax=0.25)
    np.testing.assert_allclose(pos_sw[:, 2], pos[:, 2], atol=0)

    # wire-level: clipped export still spans the full displacement range.
    # The served depth is normalize_01'd (min 0, max 1), so values outside the
    # 0.2..0.8 band exist and must clamp onto BOTH band ends — asserting the
    # bounds alone would pass a regression that stopped remapping entirely.
    status, _, body = _get(server["base"] + "/export/obj?grid=8&scale=0.5&offset=0.1&dmin=0.2&dmax=0.8")
    assert status == 200
    zs = [float(l.split()[3]) for l in body.decode().splitlines() if l.startswith("v ")]
    assert min(zs) >= 0.1 - 1e-4 and max(zs) <= 0.6 + 1e-4
    assert min(zs) <= 0.1 + 1e-4 and max(zs) >= 0.6 - 1e-4
    # non-finite query params must not poison the mesh (nan parses as float)
    status, _, body = _get(server["base"] + "/export/obj?grid=4&dmin=nan&dmax=inf&scale=nan")
    assert status == 200
    zs = [float(l.split()[3]) for l in body.decode().splitlines() if l.startswith("v ")]
    assert all(np.isfinite(z) for z in zs), "non-finite vertices leaked into the export"
    # degenerate band -> everything clamps to one of the two ends
    status, _, body = _get(server["base"] + "/export/obj?grid=4&dmin=0.5&dmax=0.5")
    assert status == 200
    zs = {round(float(l.split()[3]), 5) for l in body.decode().splitlines() if l.startswith("v ")}
    assert zs <= {0.0, 0.6}, zs


def test_depth_clip_ui_consistency():
    """The dmin/dmax feature stays consistent across its three homes: the
    vertex shader remap, the JS remapDepth used by client exports, and the
    sliders in index.html."""
    js = open(osp.join(VIEWER_DIR, "viewer.js")).read()
    html = open(osp.join(VIEWER_DIR, "index.html")).read()
    assert "uniform float uDepthMin, uDepthMax;" in js
    assert "clamp((d - uDepthMin) / max(uDepthMax - uDepthMin, 0.001), 0.0, 1.0)" in js
    assert "function remapDepth" in js and "Math.max(r[1] - r[0], 0.001)" in js
    assert 'id="depthMin"' in html and 'id="depthMax"' in html


def test_mesh_math_matches_client_source():
    """Pin the Python exporter to the exact client formulas by reading the JS
    source: winding order, vertex position expressions, GLB chunk tags."""
    from muggled_dpt_tpu.demo_helpers import mesh_export

    js = open(osp.join(VIEWER_DIR, "viewer.js")).read()
    # winding (i0, i2, i1), (i1, i2, i3)
    assert "indices[p++] = i0; indices[p++] = i2; indices[p++] = i1;" in js
    assert "indices[p++] = i1; indices[p++] = i2; indices[p++] = i3;" in js
    # position formulas
    assert "(u - 0.5) * state.aspect" in js and "0.5 - v" in js and "A * d + B" in js
    # GLB chunk tags
    assert "0x46546c67" in js and "0x4e4f534a" in js and "0x004e4942" in js

    # tiny hand-checked case: 2x2 depth, grid=1 -> 4 vertices, 2 triangles
    d = np.array([[0.0, 1.0], [0.5, 0.25]], np.float32)
    pos, uvs, idx = mesh_export.build_mesh_arrays(d, grid=1, scale=2.0, offset=1.0)
    np.testing.assert_allclose(pos[:, 2], [1.0 + 2 * 0.0, 1.0 + 2 * 1.0, 1.0 + 2 * 0.5, 1.0 + 2 * 0.25])
    np.testing.assert_allclose(pos[0], [-0.5, 0.5, 1.0])  # u=0,v=0 top-left
    np.testing.assert_array_equal(idx, [[0, 2, 1], [1, 2, 3]])


def test_mesh_sampling_rounds_half_up_like_js():
    """JS Math.round rounds .5 UP; numpy's np.round is half-to-even. At grid
    coordinates that land exactly on .5 (e.g. u=0.5 with w=2 -> px=0.5) the
    exporter must pick the same pixel the browser client would (column 1, not
    column 0)."""
    from muggled_dpt_tpu.demo_helpers import mesh_export

    # w=2: sample coord for the middle column (u=0.5) is 0.5*(2-1)=0.5 exactly
    d = np.array([[0.0, 1.0], [0.0, 1.0]], np.float32)
    pos, _, _ = mesh_export.build_mesh_arrays(d, grid=2, scale=1.0, offset=0.0)
    z = pos[:, 2].reshape(3, 3)
    # Math.round(0.5) == 1 -> middle column samples depth column 1 (value 1.0)
    np.testing.assert_allclose(z[:, 1], 1.0)
    np.testing.assert_allclose(z[:, 0], 0.0)
    np.testing.assert_allclose(z[:, 2], 1.0)


def test_lossy_depth_encoding_keeps_top_bits(model_and_dir):
    """--encode_depth jpg: lossy depth ships only the top 8 bits in R with
    G/B zeroed (reference run_3dviewer.py:585-590) and, since JPEG has no
    alpha, without the edge-mask channel."""
    model, d = model_and_dir
    img = np.random.default_rng(3).integers(0, 256, (96, 128, 3), dtype=np.uint8)
    img_path = str(d / "lossy_input.png")
    cv2.imwrite(img_path, img)
    source = run_3dviewer.InputSource(img_path)

    httpd, base = _serve(model, source, depth_ext=".jpg")
    try:
        _, headers, body = _get(base + "/frame/0")
        rgb_size = int(headers["X-rgb-size"])
        depth_img = cv2.imdecode(np.frombuffer(body[rgb_size:], np.uint8), cv2.IMREAD_UNCHANGED)
        assert depth_img is not None and depth_img.ndim == 3 and depth_img.shape[2] == 3  # no alpha
        # G/B were zeroed before encoding; JPEG noise keeps them small
        assert float(depth_img[..., 0].mean()) < 16 and float(depth_img[..., 1].mean()) < 16
        # R carries the top bits: must still span most of the range
        r = depth_img[..., 2]
        assert int(r.max()) > 200 and int(r.min()) < 55
    finally:
        httpd.shutdown()
        httpd.server_close()

    # reference PNG wire for the same frame: lossy R must track lossless R
    httpd, base = _serve(model, run_3dviewer.InputSource(img_path))
    try:
        _, headers2, body2 = _get(base + "/frame/0")
        rgb2 = int(headers2["X-rgb-size"])
        png = cv2.imdecode(np.frombuffer(body2[rgb2:], np.uint8), cv2.IMREAD_UNCHANGED)
        err = np.abs(png[..., 2].astype(np.int32) - r.astype(np.int32))
        assert float(np.median(err)) <= 8  # jpeg-tolerance agreement of top bits
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_aspect_ratio_mode_serves_nonsquare_depth(model_and_dir):
    """-ar: the served depth map follows the input's aspect ratio instead of
    the square sizing (reference run_3dviewer.py:80-86,137)."""
    model, d = model_and_dir
    img = np.random.default_rng(4).integers(0, 256, (96, 128, 3), dtype=np.uint8)
    img_path = str(d / "ar_input.png")
    cv2.imwrite(img_path, img)

    shapes = {}
    for name, use_square in (("square", True), ("ar", False)):
        httpd, base = _serve(model, run_3dviewer.InputSource(img_path), use_square=use_square)
        try:
            _, headers, body = _get(base + "/frame/0")
            rgb_size = int(headers["X-rgb-size"])
            depth_img = cv2.imdecode(np.frombuffer(body[rgb_size:], np.uint8), cv2.IMREAD_UNCHANGED)
            shapes[name] = depth_img.shape[:2]
        finally:
            httpd.shutdown()
            httpd.server_close()

    assert shapes["square"][0] == shapes["square"][1]
    h, w = shapes["ar"]
    assert w > h  # 128x96 input stays landscape in AR mode


def test_glsl_static_validation_of_viewer_shaders():
    """Both viewer shader programs pass the static ES 1.00 validator
    (tools/glsl_check.py) — the no-GL-context substitute for compileShader:
    declarations, varying linkage, precision, entry-point writes."""
    from tools.glsl_check import check_program, extract_viewer_programs

    js = open(osp.join(run_3dviewer.VIEWER_DIR, "viewer.js")).read()
    programs = extract_viewer_programs(js)
    assert {name for name, _, _ in programs} == {"main", "LINE"}
    for name, vert, frag in programs:
        assert check_program(vert, frag) == [], name


def test_glsl_validator_catches_error_classes():
    """The validator must actually detect the compile/link error classes it
    claims to: undeclared identifiers, ES3-only tokens, missing precision,
    missing gl_Position, and varying mismatches."""
    from muggled_dpt_tpu.demo_helpers import ui  # noqa: F401  (repo import path sanity)
    from tools.glsl_check import check_program, check_shader

    ok_vert = "attribute vec2 aUV; varying vec2 vUV;\nvoid main() { vUV = aUV; gl_Position = vec4(aUV, 0.0, 1.0); }"
    ok_frag = "precision mediump float; varying vec2 vUV;\nvoid main() { gl_FragColor = vec4(vUV, 0.0, 1.0); }"
    assert check_program(ok_vert, ok_frag) == []

    errs = check_shader(ok_vert.replace("gl_Position = vec4(aUV", "gl_Position = vec4(aUVtypo"), "vertex")
    assert any("aUVtypo" in e for e in errs)

    errs = check_shader("precision mediump float; uniform sampler2D t; varying vec2 vUV;\n"
                        "void main() { gl_FragColor = texture(t, vUV); }", "fragment")
    assert any("ES 3.00" in e for e in errs)

    errs = check_shader(ok_frag.replace("precision mediump float; ", ""), "fragment")
    assert any("precision" in e for e in errs)

    errs = check_shader("attribute vec2 aUV;\nvoid main() { vec2 x = aUV; }", "vertex")
    assert any("gl_Position" in e for e in errs)

    # fragment reads a varying the vertex never writes; and a type mismatch
    errs = check_program(ok_vert.replace("varying vec2 vUV;", "").replace("vUV = aUV; ", ""), ok_frag)
    assert any("never written" in e for e in errs)
    errs = check_program(ok_vert.replace("varying vec2 vUV", "varying vec3 vUV").replace(
        "vUV = aUV", "vUV = vec3(aUV, 0.0)"), ok_frag)
    assert any("type mismatch" in e for e in errs)

    # unbalanced braces
    errs = check_shader(ok_vert + "}", "vertex")
    assert any("unbalanced" in e for e in errs)
