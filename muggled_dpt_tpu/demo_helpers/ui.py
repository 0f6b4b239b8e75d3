"""Compact OpenCV UI toolkit for the interactive demos.

Plays the role of the reference's vendored ~12k-LoC 'toadui' package
(demo_helpers/toadui/): window + keypress registry, vertical/horizontal
stacking layout, sliders, toggle/press buttons, a colormap selector bar
(including a custom spectral map), text drawing, hover readouts + draggable
markers on the image panel (toadui/overlays.py), line plots
(toadui/plots.py) and a video playback bar (toadui/video.py) — implemented
from scratch and sized to what the demo apps actually use. Model-agnostic:
numpy/cv2 only."""

from __future__ import annotations

import cv2
import numpy as np

_BG = (35, 35, 35)
_FG = (210, 210, 210)
_ACCENT = (90, 160, 255)
_FONT = cv2.FONT_HERSHEY_SIMPLEX


class TextDrawer:
    """Simple text rendering helper (reference demo_helpers/text.py)."""

    def __init__(self, scale: float = 0.5, thickness: int = 1, color=_FG, font=_FONT):
        self.scale, self.thickness, self.color, self.font = scale, thickness, color, font

    def draw(self, image, text: str, xy: tuple[int, int], color=None, anchor: str = "topleft"):
        (tw, th), baseline = cv2.getTextSize(text, self.font, self.scale, self.thickness)
        x, y = xy
        if anchor == "center":
            x, y = x - tw // 2, y + th // 2
        elif anchor == "topleft":
            y = y + th
        cv2.putText(image, text, (int(x), int(y)), self.font, self.scale, color or self.color, self.thickness, cv2.LINE_AA)
        return image

    def size(self, text: str):
        (tw, th), _ = cv2.getTextSize(text, self.font, self.scale, self.thickness)
        return tw, th


class UIElement:
    """Base: fixed-height horizontal bar rendered at a given width."""

    height = 40

    def render(self, width: int) -> np.ndarray:
        raise NotImplementedError

    def on_mouse(self, x: int, y: int, event: int, flags: int = 0):
        pass

    def on_mouse_elsewhere(self):
        """Called when the cursor is over a *different* element, so hover
        state can be cleared."""
        pass

    def wants_mouse(self) -> bool:
        """True while a drag owned by this element is in progress; stacks keep
        routing events to it even when the cursor leaves its row/column (the
        scrub/drag shouldn't cancel on a few pixels of overshoot)."""
        return False


class Slider(UIElement):
    """Draggable horizontal slider (reference toadui/sliders.py)."""

    def __init__(self, label, value, min_value, max_value, step=1, marker_step=None, height=36):
        self.label = label
        self.min, self.max, self.step = min_value, max_value, step
        self._value = value
        self.height = height
        self._changed = False
        self._dragging = False
        self._marker_step = marker_step

    @property
    def value(self):
        return self._value

    def set(self, value, flag_change: bool = False):
        value = np.clip(value, self.min, self.max)
        value = self.min + round((value - self.min) / self.step) * self.step
        value = type(self.step)(value)
        if value != self._value:
            self._value = value
            self._changed = self._changed or flag_change
        return self

    def read(self):
        changed, self._changed = self._changed, False
        return changed, self._value

    def render(self, width):
        img = np.full((self.height, width, 3), _BG, np.uint8)
        pad = 10
        t = (self._value - self.min) / max(self.max - self.min, 1e-9)
        x = int(pad + t * (width - 2 * pad))
        cv2.line(img, (pad, self.height // 2), (width - pad, self.height // 2), (90, 90, 90), 2)
        cv2.circle(img, (x, self.height // 2), 7, _ACCENT, -1)
        txt = f"{self.label}: {self._value:g}" if isinstance(self._value, float) else f"{self.label}: {self._value}"
        TextDrawer(0.45).draw(img, txt, (pad, 2))
        self._width = width
        return img

    def on_mouse(self, x, y, event, flags=0):
        if event == cv2.EVENT_LBUTTONDOWN:
            self._dragging = True
        if event == cv2.EVENT_LBUTTONUP:
            self._dragging = False
        if self._dragging and event in (cv2.EVENT_LBUTTONDOWN, cv2.EVENT_MOUSEMOVE):
            pad = 10
            t = np.clip((x - pad) / max(getattr(self, "_width", 300) - 2 * pad, 1), 0, 1)
            self.set(self.min + t * (self.max - self.min), flag_change=True)

    def wants_mouse(self):
        return self._dragging


class ToggleButton(UIElement):
    def __init__(self, label, default=False, height=34):
        self.label = label
        self._on = bool(default)
        self.height = height
        self._changed = False

    def toggle(self, set_on=None):
        self._on = (not self._on) if set_on is None else bool(set_on)
        self._changed = True
        return self._on

    def read(self):
        changed, self._changed = self._changed, False
        return changed, self._on

    @property
    def is_on(self):
        return self._on

    def render(self, width):
        img = np.full((self.height, width, 3), _BG, np.uint8)
        color = _ACCENT if self._on else (80, 80, 80)
        cv2.rectangle(img, (4, 4), (width - 4, self.height - 4), color, 2)
        TextDrawer(0.45).draw(img, f"{self.label}: {'ON' if self._on else 'off'}", (12, 7))
        return img

    def on_mouse(self, x, y, event, flags=0):
        if event == cv2.EVENT_LBUTTONDOWN:
            self.toggle()


class ButtonBar(UIElement):
    """Row of momentary buttons; .read() pops the most recent click label."""

    def __init__(self, labels, height=34):
        self.labels = list(labels)
        self.height = height
        self._clicked = None
        self._width = 300

    def read(self):
        clicked, self._clicked = self._clicked, None
        return clicked

    def render(self, width):
        self._width = width
        img = np.full((self.height, width, 3), _BG, np.uint8)
        n = max(len(self.labels), 1)
        for i, lab in enumerate(self.labels):
            x0, x1 = int(i * width / n), int((i + 1) * width / n)
            cv2.rectangle(img, (x0 + 3, 4), (x1 - 3, self.height - 4), (80, 80, 80), 1)
            TextDrawer(0.42).draw(img, lab, ((x0 + x1) // 2, self.height // 2 - 6), anchor="center")
        return img

    def on_mouse(self, x, y, event, flags=0):
        if event == cv2.EVENT_LBUTTONDOWN and self.labels:
            idx = int(np.clip(x * len(self.labels) // max(self._width, 1), 0, len(self.labels) - 1))
            self._clicked = self.labels[idx]


def make_spectral_colormap() -> np.ndarray:
    """Custom spectral colormap LUT (256,1,3) BGR — the reference ships its
    own spectral map beside the cv2 builtins (toadui/colormaps.py)."""
    anchors = np.array(
        [  # RGB anchor points, dark blue -> cyan -> green -> yellow -> red
            (94, 79, 162), (50, 136, 189), (102, 194, 165), (171, 221, 164),
            (230, 245, 152), (255, 255, 191), (254, 224, 139), (253, 174, 97),
            (244, 109, 67), (213, 62, 79), (158, 1, 66),
        ],
        dtype=np.float32,
    )
    xs = np.linspace(0, 1, len(anchors))
    grid = np.linspace(0, 1, 256)
    rgb = np.stack([np.interp(grid, xs, anchors[:, c]) for c in range(3)], axis=-1)
    bgr = rgb[:, ::-1].astype(np.uint8)
    return bgr.reshape(256, 1, 3)


class ColormapsBar(UIElement):
    """Colormap selector: cv2 builtins + custom spectral + grayscale
    (reference toadui/colormaps.py). Click or .next() to cycle; .apply()
    maps a uint8 image to BGR."""

    def __init__(self, height=30):
        self.height = height
        self._maps = [
            ("spectral", make_spectral_colormap()),
            ("magma", cv2.COLORMAP_MAGMA),
            ("viridis", cv2.COLORMAP_VIRIDIS),
            ("inferno", cv2.COLORMAP_INFERNO),
            ("turbo", cv2.COLORMAP_TURBO),
            ("gray", None),
        ]
        self._idx = 0
        self._changed = False
        self._width = 300

    @property
    def name(self):
        return self._maps[self._idx][0]

    def next(self):
        self._idx = (self._idx + 1) % len(self._maps)
        self._changed = True

    def read(self):
        changed, self._changed = self._changed, False
        return changed, self._idx

    def apply(self, image_uint8: np.ndarray) -> np.ndarray:
        _, cmap = self._maps[self._idx]
        if cmap is None:
            return cv2.cvtColor(image_uint8, cv2.COLOR_GRAY2BGR)
        if isinstance(cmap, np.ndarray):
            return cv2.applyColorMap(image_uint8, cmap)
        return cv2.applyColorMap(image_uint8, cmap)

    def render(self, width):
        self._width = width
        img = np.full((self.height, width, 3), _BG, np.uint8)
        n = len(self._maps)
        ramp = np.tile(np.linspace(0, 255, width // n, dtype=np.uint8), (self.height - 8, 1))
        for i, (name, cmap) in enumerate(self._maps):
            x0 = int(i * width / n)
            seg = ramp[:, : int(width / n) - 6]
            if cmap is None:
                colored = cv2.cvtColor(seg, cv2.COLOR_GRAY2BGR)
            else:
                colored = cv2.applyColorMap(seg, cmap)
            img[4 : 4 + colored.shape[0], x0 + 3 : x0 + 3 + colored.shape[1]] = colored
            if i == self._idx:
                cv2.rectangle(img, (x0 + 1, 1), (x0 + int(width / n) - 2, self.height - 2), (255, 255, 255), 1)
        return img

    def on_mouse(self, x, y, event, flags=0):
        if event == cv2.EVENT_LBUTTONDOWN:
            self._idx = int(np.clip(x * len(self._maps) // max(self._width, 1), 0, len(self._maps) - 1))
            self._changed = True


class DraggableMarker:
    """A point overlay on an ImageDisplay the user can drag (reference
    toadui/overlays.py draggable points). Position is normalized (x, y) in
    [0, 1]; .read() pops a changed flag the way Slider.read() does."""

    GRAB_RADIUS_PX = 18

    def __init__(self, xy_norm=(0.5, 0.5), color=(80, 255, 255)):
        self.xy_norm = (float(xy_norm[0]), float(xy_norm[1]))
        self.color = color
        self._changed = False
        self._dragging = False

    def set(self, xy_norm, flag_change: bool = False):
        self.xy_norm = (float(np.clip(xy_norm[0], 0, 1)), float(np.clip(xy_norm[1], 0, 1)))
        self._changed = self._changed or flag_change
        return self

    def read(self):
        changed, self._changed = self._changed, False
        return changed, self.xy_norm


class ImageDisplay(UIElement):
    """Main image panel; height tracks the image aspect at render width.
    Supports hover readouts (set_hover_text) and draggable point markers
    (add_marker) — the overlay features of toadui/overlays.py the
    experiments use for live value inspection / token picking."""

    def __init__(self, image_bgr=None):
        self._img = image_bgr if image_bgr is not None else np.zeros((64, 64, 3), np.uint8)
        self.height = self._img.shape[0]
        self.last_click_xy_norm = None
        self.hover_xy_norm = None
        self._hover_text_fn = None
        self._markers: list[DraggableMarker] = []

    def set_image(self, image_bgr):
        self._img = image_bgr
        return self

    @property
    def image(self):
        """The current full-resolution BGR image (read-only view for savers)."""
        return self._img

    def set_hover_text(self, text_fn):
        """Attach a hover readout: text_fn((x_norm, y_norm)) -> str is drawn
        in a tooltip beside the cursor while it is over the panel."""
        self._hover_text_fn = text_fn
        return self

    def add_marker(self, xy_norm=(0.5, 0.5), color=(80, 255, 255)) -> DraggableMarker:
        marker = DraggableMarker(xy_norm, color)
        self._markers.append(marker)
        return marker

    def render(self, width):
        h, w = self._img.shape[:2]
        self.height = max(1, int(round(h * width / w)))
        self._render_wh = (width, self.height)
        if (w, h) == (width, self.height):
            img = self._img
        else:
            img = cv2.resize(self._img, (width, self.height))
        if self._markers or (self._hover_text_fn and self.hover_xy_norm):
            img = img.copy()
        for m in self._markers:
            mx, my = int(m.xy_norm[0] * width), int(m.xy_norm[1] * self.height)
            cv2.drawMarker(img, (mx, my), m.color, cv2.MARKER_CROSS, 16, 2)
            cv2.circle(img, (mx, my), 6, m.color, 1, cv2.LINE_AA)
        if self._hover_text_fn and self.hover_xy_norm is not None:
            self._draw_tooltip(img, width)
        return img

    def _draw_tooltip(self, img, width):
        text = self._hover_text_fn(self.hover_xy_norm)
        if not text:
            return
        td = TextDrawer(0.45)
        tw, th = td.size(text)
        hx, hy = int(self.hover_xy_norm[0] * width), int(self.hover_xy_norm[1] * self.height)
        x0 = min(hx + 12, width - tw - 10)
        y0 = max(hy - th - 14, 2)
        cv2.rectangle(img, (x0 - 4, y0 - 3), (x0 + tw + 4, y0 + th + 6), (25, 25, 25), -1)
        td.draw(img, text, (x0, y0))

    def on_mouse(self, x, y, event, flags=0):
        w, h = getattr(self, "_render_wh", (1, 1))
        xy_norm = (x / max(w, 1), y / max(h, 1))
        self.hover_xy_norm = xy_norm
        if event == cv2.EVENT_LBUTTONDOWN:
            self.last_click_xy_norm = xy_norm
            for m in self._markers:  # grab the nearest marker within reach
                dx, dy = (m.xy_norm[0] - xy_norm[0]) * w, (m.xy_norm[1] - xy_norm[1]) * h
                if dx * dx + dy * dy <= DraggableMarker.GRAB_RADIUS_PX**2:
                    m._dragging = True
                    break
            else:
                # click-to-place when a single marker exists (token picking)
                if len(self._markers) == 1:
                    self._markers[0].set(xy_norm, flag_change=True)
        if event == cv2.EVENT_LBUTTONUP:
            for m in self._markers:
                m._dragging = False
        if event == cv2.EVENT_MOUSEMOVE:
            for m in self._markers:
                if m._dragging:
                    m.set(xy_norm, flag_change=True)

    def on_mouse_elsewhere(self):
        self.hover_xy_norm = None

    def wants_mouse(self):
        return any(m._dragging for m in self._markers)


class LinePlot(UIElement):
    """Minimal line plot bar (reference toadui/plots.py): one 1-D series
    with min/max axis labels and an optional highlighted x index, used by the
    experiments to show per-layer statistics."""

    def __init__(self, title: str = "", height: int = 110, color=_ACCENT):
        self.title = title
        self.height = height
        self.color = color
        self._ys = None
        self._highlight = None
        self._hover_idx = None

    def set_series(self, ys, highlight_idx=None):
        self._ys = None if ys is None else np.asarray(ys, np.float32).reshape(-1)
        self._highlight = highlight_idx
        return self

    def render(self, width):
        self._width = width
        img = np.full((self.height, width, 3), _BG, np.uint8)
        ys = self._ys
        if ys is None or len(ys) == 0:
            return img
        pad_l, pad_r, pad_t, pad_b = 12, 12, 18, 10
        pw, ph = width - pad_l - pad_r, self.height - pad_t - pad_b
        lo, hi = float(ys.min()), float(ys.max())
        span = max(hi - lo, 1e-9)
        xs = pad_l + np.linspace(0, pw, len(ys))
        pys = pad_t + ph - (ys - lo) / span * ph
        pts = np.stack([xs, pys], axis=-1).astype(np.int32)
        if self._highlight is not None and 0 <= self._highlight < len(ys):
            hx = int(xs[self._highlight])
            cv2.line(img, (hx, pad_t - 4), (hx, self.height - pad_b + 4), (90, 90, 90), 1)
        cv2.polylines(img, [pts], False, self.color, 1, cv2.LINE_AA)
        for p in pts:
            cv2.circle(img, tuple(p), 2, self.color, -1, cv2.LINE_AA)
        td = TextDrawer(0.38, color=(150, 150, 150))
        label = self.title
        if self._hover_idx is not None and 0 <= self._hover_idx < len(ys):
            label = f"{self.title}  [{self._hover_idx}] = {ys[self._hover_idx]:.2f}"
        TextDrawer(0.42).draw(img, label, (pad_l, 2))
        td.draw(img, f"{hi:.2f}", (width - pad_r - td.size(f'{hi:.2f}')[0], pad_t - 6))
        td.draw(img, f"{lo:.2f}", (width - pad_r - td.size(f'{lo:.2f}')[0], self.height - pad_b - 8))
        return img

    def on_mouse(self, x, y, event, flags=0):
        if self._ys is None or len(self._ys) == 0:
            return
        pad_l, pad_r = 12, 12
        pw = max(getattr(self, "_width", 300) - pad_l - pad_r, 1)
        self._hover_idx = int(np.clip(round((x - pad_l) / pw * (len(self._ys) - 1)), 0, len(self._ys) - 1))

    def on_mouse_elsewhere(self):
        self._hover_idx = None


class PlaybackBar(UIElement):
    """Video playback control bar (reference toadui/video.py): a play/pause
    button, a draggable frame-position slider and a frame counter in one
    row. The app polls read_seek()/read_pause() each frame."""

    BTN_W = 44

    def __init__(self, total_frames: int, height: int = 36):
        self.total = max(int(total_frames), 1)
        self.height = height
        self._frame = 0
        self._paused = False
        self._seek = None
        self._pause_changed = False
        self._dragging = False
        self._width = 300

    @property
    def is_paused(self):
        return self._paused

    def set_frame(self, idx: int):
        if not self._dragging:
            self._frame = int(np.clip(idx, 0, self.total - 1))
        return self

    def toggle_pause(self, set_paused=None):
        self._paused = (not self._paused) if set_paused is None else bool(set_paused)
        self._pause_changed = True
        return self._paused

    def read_pause(self):
        changed, self._pause_changed = self._pause_changed, False
        return changed, self._paused

    def read_seek(self):
        """Pops the pending seek target (None when the user hasn't scrubbed)."""
        seek, self._seek = self._seek, None
        return seek is not None, seek

    def render(self, width):
        self._width = width
        img = np.full((self.height, width, 3), _BG, np.uint8)
        bw, hh = self.BTN_W, self.height // 2
        cv2.rectangle(img, (3, 3), (bw - 3, self.height - 3), (80, 80, 80), 1)
        if self._paused:  # show the action the button will take: play triangle
            cv2.fillPoly(img, [np.array([(bw // 2 - 5, hh - 7), (bw // 2 - 5, hh + 7), (bw // 2 + 7, hh)])], _FG)
        else:  # pause bars
            cv2.rectangle(img, (bw // 2 - 7, hh - 7), (bw // 2 - 3, hh + 7), _FG, -1)
            cv2.rectangle(img, (bw // 2 + 3, hh - 7), (bw // 2 + 7, hh + 7), _FG, -1)
        counter = f"{self._frame + 1}/{self.total}"
        td = TextDrawer(0.42)
        cw = td.size(counter)[0] + 14
        td.draw(img, counter, (width - cw + 4, hh - 7))
        pad = 10
        x0, x1 = bw + pad, width - cw - pad
        t = self._frame / max(self.total - 1, 1)
        x = int(x0 + t * max(x1 - x0, 1))
        cv2.line(img, (x0, hh), (x1, hh), (90, 90, 90), 2)
        cv2.line(img, (x0, hh), (x, hh), _ACCENT, 2)
        cv2.circle(img, (x, hh), 7, _ACCENT, -1)
        self._track = (x0, x1)
        return img

    def _scrub_to(self, x):
        x0, x1 = getattr(self, "_track", (self.BTN_W + 10, self._width - 60))
        t = np.clip((x - x0) / max(x1 - x0, 1), 0, 1)
        self._frame = int(round(t * (self.total - 1)))
        self._seek = self._frame

    def on_mouse(self, x, y, event, flags=0):
        if event == cv2.EVENT_LBUTTONDOWN:
            if x < self.BTN_W:
                self.toggle_pause()
            else:
                self._dragging = True
                self._scrub_to(x)
        if event == cv2.EVENT_LBUTTONUP:
            self._dragging = False
        if self._dragging and event == cv2.EVENT_MOUSEMOVE:
            self._scrub_to(x)

    def wants_mouse(self):
        return self._dragging


class HStack(UIElement):
    """Horizontal row of elements sharing one bar height (reference
    toadui/layout.py). Children split the width equally; the row height
    tracks the tallest child's natural height each render (image panels
    change aspect when their content changes), and any child stretched to
    the row height gets its mouse-normalization size fixed up to match."""

    def __init__(self, *elements, height=None):
        self.elements = [e for e in elements if e is not None]
        self._fixed_height = height
        self.height = height or max((e.height for e in self.elements), default=34)

    def render(self, width):
        n = max(len(self.elements), 1)
        widths = [width // n] * n
        widths[-1] += width - sum(widths)
        parts = [e.render(w) for e, w in zip(self.elements, widths)]
        self.height = self._fixed_height or max(p.shape[0] for p in parts)
        for i, (e, w) in enumerate(zip(self.elements, widths)):
            if parts[i].shape[0] != self.height:
                parts[i] = cv2.resize(parts[i], (w, self.height))
                if isinstance(e, ImageDisplay):
                    # hover/marker math must use the displayed size
                    e._render_wh = (w, self.height)
        self._widths = widths
        return np.hstack(parts)

    def on_mouse(self, x, y, event, flags=0):
        offs = np.cumsum([0] + getattr(self, "_widths", []))
        # exclusive drag routing: while one child owns a drag, only it gets
        # live events (clipped into its band so the drag survives overshoot);
        # everything else sees on_mouse_elsewhere — otherwise releasing a drag
        # over a neighbor would spuriously trigger its LBUTTONUP handling
        drag_owner = next((e for e in self.elements if e.wants_mouse()), None)
        for i, e in enumerate(self.elements):
            if e is drag_owner:
                e.on_mouse(int(np.clip(x - offs[i], 0, offs[i + 1] - offs[i] - 1)), y, event, flags)
            elif drag_owner is None and offs[i] <= x < offs[i + 1]:
                e.on_mouse(x - offs[i], y, event, flags)
            else:
                e.on_mouse_elsewhere()

    def wants_mouse(self):
        return any(e.wants_mouse() for e in self.elements)

    def on_mouse_elsewhere(self):
        for e in self.elements:
            e.on_mouse_elsewhere()


class VStack:
    """Vertical layout + mouse routing (reference toadui/layout.py)."""

    def __init__(self, *elements):
        self.elements = [e for e in elements if e is not None]

    def render(self, width: int) -> np.ndarray:
        parts = [e.render(width) for e in self.elements]
        self._offsets = np.cumsum([0] + [p.shape[0] for p in parts])
        return np.vstack(parts)

    def on_mouse(self, x, y, event, flags=0):
        offs = getattr(self, "_offsets", None)
        if offs is None:
            return
        # exclusive drag routing (see HStack.on_mouse): the drag owner gets
        # events clipped into its row; everyone else gets on_mouse_elsewhere
        drag_owner = next((e for e in self.elements if e.wants_mouse()), None)
        for i, e in enumerate(self.elements):
            if e is drag_owner:
                e.on_mouse(x, int(np.clip(y - offs[i], 0, offs[i + 1] - offs[i] - 1)), event, flags)
            elif drag_owner is None and offs[i] <= y < offs[i + 1]:
                e.on_mouse(x, y - offs[i], event, flags)
            else:
                e.on_mouse_elsewhere()

    def wants_mouse(self):
        return any(e.wants_mouse() for e in self.elements)

    def on_mouse_elsewhere(self):
        for e in self.elements:
            e.on_mouse_elsewhere()


class DisplayWindow:
    """cv2 window with a keypress-callback registry and mouse routing to a
    layout (reference toadui/window.py)."""

    WINDOW_CLOSE_KEYS = (27, ord("q"))  # esc / q

    def __init__(self, title: str = "Display"):
        self.title = title
        self._key_callbacks = {}
        self._layout = None
        self._created = False

    def attach(self, layout: VStack):
        self._layout = layout
        return self

    def attach_keypress_callback(self, key, callback):
        self._key_callbacks[key if isinstance(key, int) else ord(key)] = callback
        return self

    def _ensure_window(self):
        if not self._created:
            cv2.namedWindow(self.title, cv2.WINDOW_AUTOSIZE)
            if self._layout is not None:
                cv2.setMouseCallback(self.title, self._on_mouse)
            self._created = True

    def _on_mouse(self, event, x, y, flags, _param):
        if self._layout is not None:
            self._layout.on_mouse(x, y, event, flags)

    def show(self, image_or_width=800, frame_delay_ms: int = 1):
        """Render the attached layout (or show a raw image) and pump events.
        Returns (request_close, keypress)."""
        self._ensure_window()
        if isinstance(image_or_width, np.ndarray):
            frame = image_or_width
        else:
            frame = self._layout.render(int(image_or_width))
        cv2.imshow(self.title, frame)
        key = cv2.waitKey(frame_delay_ms) & 0xFF
        if key in self._key_callbacks:
            self._key_callbacks[key]()
        request_close = key in self.WINDOW_CLOSE_KEYS
        try:
            if cv2.getWindowProperty(self.title, cv2.WND_PROP_VISIBLE) < 1:
                request_close = True
        except cv2.error:
            request_close = True
        return request_close, key

    def close(self):
        if self._created:
            cv2.destroyWindow(self.title)
            self._created = False
