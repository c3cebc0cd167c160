"""Viewer state machine (viewer.PanoramaViewer) vs the reference's GTK
toolbar semantics (_viewer_toolbar.cpp, _image_viewer.cpp:429-461):
zoom ladder construction, crop rescaling/clamping, undo/redo stack."""

import numpy as np

from simplepanorama_tpu.viewer import PanoramaViewer, zoom_ladder


class _StubPano:
    """get_preview/get_panorama stub: full res = 2x preview."""

    def __init__(self, h=600, w=1400):
        rng = np.random.default_rng(0)
        self.prev = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)

    def get_preview(self):
        return self.prev

    def get_panorama(self, roi=None):
        import cv2
        full = cv2.resize(self.prev, (self.prev.shape[1] * 2,
                                      self.prev.shape[0] * 2))
        if roi is None:
            return full
        x, y, w, h = roi
        return full[2 * y:2 * (y + h), 2 * x:2 * (x + w)]


def test_zoom_ladder_shape():
    # [800, 1000, 1200, W] in 200-px steps, last rung = full width
    assert zoom_ladder(1400) == [800, 1000, 1200, 1400]
    assert zoom_ladder(950) == [800, 950]       # < one full step above 800
    assert zoom_ladder(800) == []               # native, no ladder
    assert zoom_ladder(500) == []


def test_zoom_steps():
    v = PanoramaViewer(_StubPano())
    assert v.zoom_val == [800, 1000, 1200, 1400]
    assert v.current_zoom == 1                  # starts at second rung
    assert v.display_width == 1000
    assert v.zoom_in() and v.display_width == 1200
    assert v.zoom_in() and v.display_width == 1400
    assert not v.zoom_in()                      # top of ladder
    assert v.zoom_out() and v.display_width == 1200
    d = v.display()
    assert d.shape[1] == 1200


def test_crop_display_coords_rescale():
    v = PanoramaViewer(_StubPano())
    # at display width 1000 of a 1400 preview, ratio = 1.4
    assert v.display_width == 1000
    assert v.crop((100, 50, 500, 300))
    assert v.crop_preview == (140, 70, 700, 420)


def test_crop_negative_drag_normalized():
    v = PanoramaViewer(_StubPano())
    # backwards drag: (x+w, y+h) drawn toward the origin
    assert v.crop((600, 350, -500, -300))
    a = v.crop_preview
    v2 = PanoramaViewer(_StubPano())
    assert v2.crop((100, 50, 500, 300))
    assert a == v2.crop_preview


def test_crop_empty_intersection_rejected():
    v = PanoramaViewer(_StubPano())
    assert v.crop((100, 50, 400, 300))
    before = v.crop_preview
    assert not v.crop((2000, 2000, 100, 100), display_coords=False)
    assert v.crop_preview == before


def test_crop_nested_and_undo_redo():
    v = PanoramaViewer(_StubPano())
    assert v.crop((0, 0, 700, 300), display_coords=False)
    first = v.crop_preview
    assert v.crop((100, 100, 900, 900), display_coords=False)
    second = v.crop_preview
    # nested crop intersects with the first
    assert second == (100, 100, 600, 200)
    assert v.undo_crop() and v.crop_preview == first
    assert v.undo_crop() and v.crop_preview == (0, 0, 1400, 600)
    assert not v.undo_crop()
    assert v.redo_crop() and v.crop_preview == first
    assert v.redo_crop() and v.crop_preview == second
    assert not v.redo_crop()
    # a new crop truncates the redo tail
    assert v.undo_crop()
    assert v.crop((0, 0, 50, 50), display_coords=False)
    assert not v.redo_crop()


def test_save_full_res_crop(tmp_path):
    import cv2
    v = PanoramaViewer(_StubPano())
    assert v.crop((0, 0, 350, 150), display_coords=False)
    out = tmp_path / "crop.png"
    assert v.save(str(out), full_res=True)
    img = cv2.imread(str(out))
    assert img.shape[:2] == (300, 700)          # 2x the preview crop
