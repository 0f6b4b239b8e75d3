"""Compact OpenCV UI toolkit for the interactive demos.

Plays the role of the reference's vendored ~12k-LoC 'toadui' package
(demo_helpers/toadui/): window + keypress registry, vertical stacking layout,
sliders, toggle/press buttons, a colormap selector bar (including a custom
spectral map), and text drawing — implemented from scratch and sized to what
the demo apps actually use. Model-agnostic: numpy/cv2 only."""

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


class ImageDisplay(UIElement):
    """Main image panel; height tracks the image aspect at render width."""

    def __init__(self, image_bgr=None):
        self._img = image_bgr if image_bgr is not None else np.zeros((64, 64, 3), np.uint8)
        self.height = self._img.shape[0]
        self.last_click_xy_norm = None

    def set_image(self, image_bgr):
        self._img = image_bgr
        return self

    @property
    def image(self):
        """The current full-resolution BGR image (read-only view for savers)."""
        return self._img

    def render(self, width):
        h, w = self._img.shape[:2]
        self.height = max(1, int(round(h * width / w)))
        self._render_wh = (width, self.height)
        if (w, h) == (width, self.height):
            return self._img
        return cv2.resize(self._img, (width, self.height))

    def on_mouse(self, x, y, event, flags=0):
        if event == cv2.EVENT_LBUTTONDOWN:
            w, h = getattr(self, "_render_wh", (1, 1))
            self.last_click_xy_norm = (x / max(w, 1), y / max(h, 1))


class HStack(UIElement):
    """Horizontal row of elements sharing one bar height (reference
    toadui/layout.py). Children split the width equally."""

    def __init__(self, *elements, height=None):
        self.elements = [e for e in elements if e is not None]
        self.height = height or max((e.height for e in self.elements), default=34)

    def render(self, width):
        n = max(len(self.elements), 1)
        widths = [width // n] * n
        widths[-1] += width - sum(widths)
        parts = []
        for e, w in zip(self.elements, widths):
            img = e.render(w)
            if img.shape[0] != self.height:
                img = cv2.resize(img, (w, self.height))
            parts.append(img)
        self._widths = widths
        return np.hstack(parts)

    def on_mouse(self, x, y, event, flags=0):
        offs = np.cumsum([0] + getattr(self, "_widths", []))
        for i, e in enumerate(self.elements):
            if offs[i] <= x < offs[i + 1]:
                e.on_mouse(x - offs[i], y, event, flags)


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
        for i, e in enumerate(self.elements):
            if offs[i] <= y < offs[i + 1]:
                e.on_mouse(x, y - offs[i], event, flags)
                # sliders keep dragging even when the cursor leaves their bar
            elif isinstance(e, Slider) and e._dragging:
                e.on_mouse(x, 0, event, flags)


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
