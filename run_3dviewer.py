#!/usr/bin/env python3
"""Browser-based 3D depth viewer (TPU-native rebuild of the reference
run_3dviewer.py): serves a WebGL page that displaces a dense plane mesh by the
model's depth prediction, for images, videos or webcam, with OBJ/GLB export
done client-side.

Protocol (mirrors the reference's wire format, run_3dviewer.py:563-707):
  GET  /                  -> viewer page (static whitelist for html/js)
  GET  /frame/<idx>       -> body = rgb_png + depth_png concatenated;
                             X-rgb-size / X-depth-size headers give lengths.
                             Depth is packed 24-bit into the R,G,B bytes of a
                             PNG (browsers have no >8-bit image channels,
                             reference run_3dviewer.py:586-590); alpha carries
                             an edge mask (Sobel magnitude of depth) used to
                             hide 'stretchy' mesh edges (reference MaskData,
                             run_3dviewer.py:395-500).
  GET  /get-source-info   -> JSON {type, frame_count, fps, is_metric}
  POST /upload            -> replace the current input with an uploaded image
"""

import argparse
import json
import os.path as osp
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import cv2
import numpy as np

from muggled_dpt_tpu.make_dpt import make_dpt_from_state_dict
from muggled_dpt_tpu.demo_helpers.history_keeper import HistoryKeeper
from muggled_dpt_tpu.demo_helpers.loading import ask_for_model_path, ask_for_path
from muggled_dpt_tpu.demo_helpers.misc import make_device_config, reduce_overthreading
from muggled_dpt_tpu.demo_helpers.postprocess import normalize_01, remove_infinities

VIEWER_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "muggled_dpt_tpu", "demo_helpers", "viewer3d")
STATIC_WHITELIST = {"/": "index.html", "/index.html": "index.html", "/viewer.js": "viewer.js"}

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class InputSource:
    """Polymorphic image / video / webcam input (reference run_3dviewer.py:171-291)."""

    def __init__(self, path_or_cam: str):
        self._lock = threading.Lock()
        self._set_source(path_or_cam)

    def _set_source(self, path_or_cam: str):
        self.is_webcam = str(path_or_cam).isdigit()
        self.is_image = (not self.is_webcam) and str(path_or_cam).lower().endswith(IMAGE_EXTS)
        self.path = str(path_or_cam)
        if self.is_image:
            self._image = cv2.imread(self.path)
            assert self._image is not None, f"Could not read image: {self.path}"
            self._cap = None
            self.frame_count, self.fps = 1, 0.0
        else:
            src = int(self.path) if self.is_webcam else self.path
            self._cap = cv2.VideoCapture(src)
            assert self._cap.isOpened(), f"Could not open: {self.path}"
            self._image = None
            self.frame_count = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT)) if not self.is_webcam else -1
            self.fps = self._cap.get(cv2.CAP_PROP_FPS) or 30.0

    def swap_to_image_bytes(self, data: bytes) -> bool:
        """POST /upload support: replace the source with an uploaded image."""
        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            return False
        with self._lock:
            if self._cap is not None:
                self._cap.release()
            self._cap, self._image = None, arr
            self.is_image, self.is_webcam = True, False
            self.frame_count, self.fps = 1, 0.0
            self.path = "<uploaded>"
        return True

    def read_frame(self, idx: int) -> np.ndarray | None:
        with self._lock:
            if self._image is not None:
                return self._image
            if self.is_webcam:
                ok, frame = self._cap.read()
                return frame if ok else None
            if self.frame_count > 0:
                self._cap.set(cv2.CAP_PROP_POS_FRAMES, idx % self.frame_count)
            ok, frame = self._cap.read()
            return frame if ok else None

    def info(self) -> dict:
        kind = "webcam" if self.is_webcam else ("image" if self.is_image else "video")
        return {"type": kind, "frame_count": self.frame_count, "fps": self.fps}


def encode_frame(model, source, idx, max_side, is_metric, jpg_quality=80):
    """Run inference and encode (rgb_jpg_bytes, depth_png_bytes)."""
    frame = source.read_frame(idx)
    if frame is None:
        return None, None
    depth = np.asarray(model.inference(frame, max_side, True), np.float32).squeeze()
    if not is_metric:
        depth = normalize_01(remove_infinities(depth))

    # 24-bit packing into R,G,B (reference run_3dviewer.py:579-590)
    d24 = np.clip(np.round(depth * (2**24 - 1)), 0, 2**24 - 1).astype(np.uint32)
    packed = np.zeros((*depth.shape, 3), np.uint8)
    packed[..., 2] = (d24 >> 16) & 255  # R (cv2 is BGR)
    packed[..., 1] = (d24 >> 8) & 255
    packed[..., 0] = d24 & 255

    # edge mask -> alpha: high Sobel magnitude = depth discontinuity
    d8 = (depth * 255).astype(np.uint8) if not is_metric else cv2.normalize(depth, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    gx = cv2.Sobel(d8, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(d8, cv2.CV_32F, 0, 1, ksize=3)
    mag = np.sqrt(gx * gx + gy * gy)
    alpha = np.where(mag > 100.0, 0, 255).astype(np.uint8)
    packed_bgra = np.dstack([packed, alpha])

    ok1, rgb_bytes = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, jpg_quality])
    ok2, depth_bytes = cv2.imencode(".png", packed_bgra)
    if not (ok1 and ok2):
        return None, None
    return rgb_bytes.tobytes(), depth_bytes.tobytes()


def make_handler(model, source, max_side, is_metric):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, code, body=b"", content_type="text/plain", extra_headers=None):
            try:
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra_headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)
            except (BrokenPipeError, ConnectionResetError):
                pass  # tolerate client disconnects (reference run_3dviewer.py:606-611)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path in STATIC_WHITELIST:
                file_path = osp.join(VIEWER_DIR, STATIC_WHITELIST[path])
                ctype = "text/html" if file_path.endswith(".html") else "application/javascript"
                with open(file_path, "rb") as f:
                    return self._send(200, f.read(), ctype)
            if path == "/get-source-info":
                info = dict(source.info(), is_metric=is_metric)
                return self._send(200, json.dumps(info).encode(), "application/json")
            if path.startswith("/frame/"):
                try:
                    idx = int(path.split("/")[-1])
                except ValueError:
                    return self._send(400, b"bad frame index")
                rgb, depth = encode_frame(model, source, idx, max_side, is_metric)
                if rgb is None:
                    return self._send(503, b"no frame")
                return self._send(
                    200,
                    rgb + depth,
                    "application/octet-stream",
                    {"X-rgb-size": str(len(rgb)), "X-depth-size": str(len(depth))},
                )
            return self._send(404, b"not found")

        def do_POST(self):
            if self.path.split("?")[0] == "/upload":
                length = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(length)
                ok = source.swap_to_image_bytes(data)
                return self._send(200 if ok else 400, b"ok" if ok else b"bad image")
            return self._send(404, b"not found")

    return Handler


def main():
    parser = argparse.ArgumentParser(description="Serve the browser 3D depth viewer")
    parser.add_argument("-i", "--input_path", default=None, help="Image/video path or webcam number")
    parser.add_argument("-m", "--model_path", default=None)
    parser.add_argument("-b", "--base_size_px", default=None, type=int)
    parser.add_argument("-p", "--port", default=8000, type=int)
    parser.add_argument("--host", default="localhost")
    parser.add_argument("-d", "--device", default=None, help="Device backend ('cpu' or default accelerator)")
    parser.add_argument("-f32", "--use_float32", action="store_true")
    parser.add_argument("--int8", action="store_true", help="int8 encoder serving tier (see docs/performance.md)")
    args = parser.parse_args()

    from muggled_dpt_tpu.demo_helpers.misc import select_device

    select_device(args.device)
    reduce_overthreading()
    from muggled_dpt_tpu.demo_helpers.misc import enable_compilation_cache

    enable_compilation_cache()
    history = HistoryKeeper()
    _, hist_input = history.read("input_path")
    _, hist_model = history.read("model_path")
    input_path = args.input_path or ask_for_path("Enter path to image/video (or webcam number)", hist_input, must_exist=False)
    model_path = args.model_path or ask_for_model_path(default_path=hist_model)
    history.store(input_path=str(input_path), model_path=model_path)

    device_config = make_device_config(use_float32=args.use_float32)
    print("", "Loading model weights...", f"  @ {model_path}", sep="\n", flush=True)
    config, model = make_dpt_from_state_dict(model_path, dtype=device_config["dtype"])
    if args.int8:
        try:
            model = model.quantize_encoder_int8()
            print("  int8 encoder tier enabled")
        except NotImplementedError as e:
            print(f"  --int8 unavailable for this family ({e}); using dense path")
    is_metric = bool(config.get("is_metric", False))
    max_side = args.base_size_px or model.default_size_px

    source = InputSource(str(input_path))

    # Warm up: compile the inference program in the main thread before serving
    # so the first browser request isn't stuck behind a multi-second compile.
    probe = source.read_frame(0)
    if probe is not None:
        print("Compiling inference program...", flush=True)
        np.asarray(model.inference(probe, max_side, True))
        print("Ready.", flush=True)

    server = ThreadingHTTPServer((args.host, args.port), make_handler(model, source, max_side, is_metric))
    print(f"\nServing 3D viewer at http://{args.host}:{args.port}\n(ctrl+c to quit)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    server.server_close()


if __name__ == "__main__":
    main()
