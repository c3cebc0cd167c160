"""Compositing orchestration: the reference's pan::stitch_parameters.

set_config (/root/reference/src/classes/_panorama.cpp:75-158):
  optional straightening -> projector with focal = K(0,0) of the
  best-connected camera -> warp all connected images -> (stereographic
  center fix) -> optional intensity equalization -> optional gain
  compensation -> seam masks (graph-cut if ``cut`` else distance-transform
  if MULTI_BLEND or ``cut_seams``).

get_preview (:161-209): gain-divided images + intensity adjustment,
then blend dispatch (:220-256): NO_BLEND pastes with cut masks when
available, SIMPLE_BLEND feathers the footprint masks, MULTI_BLEND blends
cut seams against the footprint.

return_full (:259-354): reload full-res images, rescale K by the
resolution ratio, re-project, resize seam masks, re-blend — BA never
reruns at full resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from simplepanorama_tpu.config import Config, Blending, Projection
from simplepanorama_tpu.stitch import StitchResult
from simplepanorama_tpu.render import projection as prj
from simplepanorama_tpu.render import blending as blnd
from simplepanorama_tpu.render import exposure as expo

_PROJ_KIND = {
    Projection.SPHERICAL: "spherical",
    Projection.CYLINDRICAL: "cylindrical",
    Projection.STEREOGRAPHIC: "stereographic",
}


@dataclasses.dataclass
class StitchParams:
    """Post-BA compositing state (pan::stitch_parameters).

    The packed warped blocks live ON DEVICE (render.compose.ComposeState);
    profiling showed host<->device block traffic dominated compositing, so
    the preview path never materializes them host-side. List views are
    provided for the host-side detours (stereographic fix, graph cut).
    """
    res: StitchResult
    rot: np.ndarray                 # possibly straightened copy
    proj_kind: str
    scale: float
    state: "object"                 # render.compose.ComposeState
    gains: Optional[np.ndarray] = None
    sten_circle: Optional[tuple] = None

    # ---- list views (host) used by render_full / sten_fix / graphcut ----
    def _lists(self):
        import numpy as _np
        st = self.state
        imgs = _np.asarray(st.imgs)
        msks = _np.asarray(st.masks)
        out_i, out_m, corners = [], [], []
        for b, (tlx, tly, rw, rh) in enumerate(st.rois):
            out_i.append(imgs[b, :rh, :rw])
            out_m.append(msks[b, :rh, :rw])
            corners.append((tlx, tly))
        return out_i, out_m, corners

    @property
    def imgs(self):
        return self._lists()[0]

    @property
    def masks(self):
        return self._lists()[1]

    @property
    def corners(self):
        return [(r[0], r[1]) for r in self.state.rois]

    @property
    def seam_masks(self):
        if self.state.seam_masks is None:
            return None
        import numpy as _np
        sm = _np.asarray(self.state.seam_masks)
        return [sm[b, :rh, :rw]
                for b, (_, _, rw, rh) in enumerate(self.state.rois)]


def _pack_state(imgs, masks, corners, seam_masks=None):
    """Repack host lists into a ComposeState (after host-side detours)."""
    import jax.numpy as _jnp
    from simplepanorama_tpu.render.compose import ComposeState
    from simplepanorama_tpu.geometry.canvas import get_pan_dimension
    sizes = [im.shape[:2] for im in imgs]
    d = get_pan_dimension(corners, sizes)
    Hb = max(s[0] for s in sizes)
    Wb = max(s[1] for s in sizes)
    Hb = (Hb + 7) // 8 * 8
    Wb = (Wb + 127) // 128 * 128
    n = len(imgs)
    ib = np.zeros((n, Hb, Wb, 3), np.float32)
    mb = np.zeros((n, Hb, Wb), bool)
    sb = np.zeros((n, Hb, Wb), bool) if seam_masks is not None else None
    offs = np.zeros((n, 2), np.int32)
    rois = []
    for i, (im, mk, (tx, ty)) in enumerate(zip(imgs, masks, corners)):
        h, w = im.shape[:2]
        ib[i, :h, :w] = im
        mb[i, :h, :w] = np.asarray(mk) > 0
        if sb is not None:
            sb[i, :h, :w] = np.asarray(seam_masks[i]) > 0
        offs[i] = (ty - d.min_y, tx - d.min_x)
        rois.append((tx, ty, w, h))
    return ComposeState(
        imgs=_jnp.asarray(ib), masks=_jnp.asarray(mb),
        offs=_jnp.asarray(offs), rois=rois,
        canvas_hw=(d.height, d.width), min_xy=(d.min_x, d.min_y),
        seam_masks=_jnp.asarray(sb) if sb is not None else None)


def set_config(res: StitchResult, images: Sequence[np.ndarray],
               cfg: Config,
               progress: Optional[Callable[[float], None]] = None,
               cancelled: Optional[Callable[[], bool]] = None,
               dev_images=None,
               ) -> StitchParams:
    """images: the *component's* images (res.nodes order), BGR uint8.
    ``dev_images``: optional (batch_u8, rows) device-resident pixel source
    (see compose.warp_all) — rows indexed like ``images``."""
    from simplepanorama_tpu.render import compose
    from simplepanorama_tpu.utils.timing import stage
    rot = res.rot.copy()
    if cfg.straighten:
        rot = expo.straighten(rot)

    scale = float(res.K[res.center][0, 0])
    kind = _PROJ_KIND[cfg.proj]

    with stage("warp"):
        state = compose.warp_all(kind, scale, images, list(rot),
                                 list(res.K), list(res.connectivity),
                                 dev_images=dev_images)
    params = StitchParams(res=res, rot=rot, proj_kind=kind, scale=scale,
                          state=state)

    # stereographic missing-center fix (host detour, then repack)
    if cfg.fix_center and cfg.proj == Projection.STEREOGRAPHIC:
        from simplepanorama_tpu.render import sten_fix
        with stage("sten_fix"):
            sten_fix.apply_center_fix(params, cfg)

    if cancelled is not None and cancelled():
        raise RuntimeError("Process canceled")

    st = params.state
    if cfg.blend_intensity:
        with stage("equalize"):
            st.intensity = compose.equalize_dev(st.imgs, st.masks, st.offs,
                                                st.canvas_hw)

    if cfg.gain_compensation:
        with stage("gain"):
            params.gains = compose.gain_dev(st.imgs, st.masks, st.offs,
                                            st.canvas_hw, res.adj)

    if cfg.cut:
        import jax as _jax
        from simplepanorama_tpu.render import graphcut
        seq = [n for n, _ in res.order]
        with stage("graph_cut"):
            if _jax.default_backend() == "cpu":
                # host loop + native Dinic (the fast CPU solver); syncs
                # per image by construction
                imgs_l, masks_l, corners_l = params._lists()
                seams_l = graphcut.graph_cut(
                    imgs_l, masks_l, corners_l, seq, progress=progress,
                    cancelled=cancelled)
                st.seam_masks = _pack_state(imgs_l, masks_l, corners_l,
                                            seams_l).seam_masks
            else:
                # accelerator: device-chain incremental cut — the canvas
                # stays on device and the per-image solves pipeline with
                # no host sync until the final mask download
                st.seam_masks = graphcut.graph_cut_state(
                    st, seq, progress=progress, cancelled=cancelled)
    elif cfg.blend == Blending.MULTI_BLEND or cfg.cut_seams:
        with stage("dist_cut"):
            st.seam_masks = compose.dist_cut_dev(st.masks, st.offs,
                                                 st.canvas_hw)

    return params


def _blend_dispatch(params: StitchParams, cfg: Config,
                    imgs: List[np.ndarray],
                    masks: List[np.ndarray],
                    seam_masks: Optional[List[np.ndarray]],
                    corners) -> np.ndarray:
    if cfg.blend == Blending.NO_BLEND:
        use_masks = seam_masks if (cfg.cut or cfg.cut_seams) and seam_masks \
            else masks
        out = blnd.blend("NO_BLEND", imgs, use_masks, masks, corners)
    elif cfg.blend == Blending.SIMPLE_BLEND:
        out = blnd.blend("SIMPLE_BLEND", imgs, masks, masks, corners)
    else:
        out = blnd.blend("MULTI_BLEND", imgs, seam_masks, masks, corners,
                         bands=cfg.bands, sigma=cfg.sigma_blend)
    return np.clip(out, 0, 255).astype(np.uint8)


def render_preview(params: StitchParams, cfg: Config) -> np.ndarray:
    """Preview assembly (stitch_parameters::get_preview) — device path."""
    from simplepanorama_tpu.render import compose
    from simplepanorama_tpu.utils.timing import stage
    import jax.numpy as jnp
    with stage("render_preview"):
        return _render_preview_inner(params, cfg, compose, jnp)


def _render_preview_inner(params, cfg, compose, jnp):
    st = params.state
    imgs = st.imgs
    if cfg.gain_compensation and params.gains is not None:
        imgs = imgs / jnp.asarray(params.gains, jnp.float32)[:, None, None,
                                                             None]
    if cfg.blend_intensity and st.intensity is not None:
        imgs = compose.apply_intensity_dev(imgs, st.intensity)
    method = ("NO_BLEND" if cfg.blend == Blending.NO_BLEND else
              "SIMPLE_BLEND" if cfg.blend == Blending.SIMPLE_BLEND else
              "MULTI_BLEND")
    if method == "NO_BLEND" and not (cfg.cut or cfg.cut_seams):
        st = dataclasses.replace(st, seam_masks=None)
    out = compose.blend_dev(method, st, imgs, cfg.bands, cfg.sigma_blend)
    if params.sten_circle is not None:
        from simplepanorama_tpu.render import sten_fix
        (ax, ay), r = params.sten_circle
        out = sten_fix.inpaint_center(
            out, (ax - st.min_xy[0], ay - st.min_xy[1]), r)
    return out


def render_full(params: StitchParams, cfg: Config,
                full_images: Sequence[Optional[np.ndarray]],
                src_stack=None) -> np.ndarray:
    """Full-resolution re-render (stitch_parameters::return_full):
    rescale K by the full/preview resolution ratio, re-project, resize
    seam masks (on device), re-blend. ``full_images`` indexed like the
    component.

    Dispatch: the streaming device path (render.fullres) — blocks are
    warped, corrected and folded into the canvas accumulators one chunk
    at a time and never round-trip to host lists; memory is bounded by
    the canvas + one chunk regardless of image count. The stereographic
    center fix needs a global circle estimate + per-image disk remap of
    the full-res warp (host detour by design), so fix_center +
    STEREOGRAPHIC keeps the host path."""
    if cfg.fix_center and cfg.proj == Projection.STEREOGRAPHIC:
        return render_full_host(params, cfg, full_images)
    from simplepanorama_tpu.render.fullres import render_full_dev
    from simplepanorama_tpu.utils.timing import stage
    with stage("render_full"):
        return render_full_dev(params, cfg, full_images,
                               src_stack=src_stack)


def render_full_host(params: StitchParams, cfg: Config,
                     full_images: Sequence[Optional[np.ndarray]]
                     ) -> np.ndarray:
    """Host-list full-res path (the round-2 formulation; kept as the
    oracle for the streaming device path and for the stereographic
    center re-fix, whose circle estimate is host-global)."""
    import cv2
    res = params.res
    n = len(res.nodes)
    K_scaled = res.K.copy().astype(np.float64)
    sizes_full = []
    ratio = 1.0
    for l in range(n):
        img = full_images[l]
        if img is None:
            sizes_full.append(res.sizes[l])
            continue
        h0, w0 = res.sizes[l]
        h1, w1 = img.shape[:2]
        r = w1 / w0
        ratio = r
        K_scaled[l, 0, 0] *= r
        K_scaled[l, 0, 2] *= r
        K_scaled[l, 1, 1] *= r
        K_scaled[l, 1, 2] *= r
        sizes_full.append((h1, w1))

    scale = float(K_scaled[res.center][0, 0])
    imgs_f = [im.astype(np.float32) if im is not None
              else np.zeros((4, 4, 3), np.float32) for im in full_images]
    pd = prj.get_proj_parameters(
        params.proj_kind, scale, imgs_f, list(params.rot), list(K_scaled),
        list(res.connectivity))

    # stereographic center re-fix at FULL resolution (return_full,
    # _panorama.cpp:292-311): fresh circle estimate on the full-res masks,
    # disk_reproj of the full-res warp, inpaint anchor for after the blend
    sten_full = None
    if cfg.fix_center and cfg.proj == Projection.STEREOGRAPHIC:
        from simplepanorama_tpu.render import sten_fix
        from simplepanorama_tpu.config import Stretch
        est = sten_fix.estimate_circle(pd.masks, pd.corners)
        if est is not None:
            (cx, cy), r = est
            quad = cfg.stretching == Stretch.QUADRATIC_SCALING
            f_imgs, f_masks, f_corners, ansatz = sten_fix.disk_reproj(
                pd.imgs, pd.masks, pd.corners, (cx, cy), r, quad)
            pd = prj.ProjData(imgs=f_imgs, masks=f_masks,
                              corners=f_corners)
            sten_full = (ansatz, r)

    seam_masks = None
    if params.seam_masks is not None:
        seam_masks = []
        for sm, im in zip(params.seam_masks, pd.imgs):
            smf = cv2.resize(sm.astype(np.float32),
                             (im.shape[1], im.shape[0]),
                             interpolation=cv2.INTER_CUBIC)
            seam_masks.append(smf > 0.5)

    imgs = pd.imgs
    if cfg.gain_compensation and params.gains is not None:
        imgs = [im / g for im, g in zip(imgs, params.gains)]
    if cfg.blend_intensity and params.state.intensity is not None:
        fields_dev = np.asarray(params.state.intensity)
        fields = [fields_dev[b, :rh // 2, :rw // 2]
                  for b, (_, _, rw, rh) in enumerate(params.state.rois)]
        imgs = expo.adjust_intensity(imgs, fields)
    out = _blend_dispatch(params, cfg, list(imgs), pd.masks, seam_masks,
                          pd.corners)
    if sten_full is not None:
        from simplepanorama_tpu.render import sten_fix
        from simplepanorama_tpu.geometry.canvas import get_pan_dimension
        (ax, ay), r = sten_full
        d = get_pan_dimension(pd.corners, [im.shape[:2] for im in pd.imgs])
        out = sten_fix.inpaint_center(out, (ax - d.min_x, ay - d.min_y), r)
    return out


# ---------------------------------------------------------------------------
# Full pipeline driver (pan::panorama::stitch_panorama, _panorama.cpp:440-537)
# ---------------------------------------------------------------------------

def run_pipeline(images, cfg: Config, progress=None, cancel_token=None):
    """load -> features -> adjacency -> components -> focal -> BA -> warp.

    ``images`` is an io.ImageSet; returns (StitchResult, StitchParams,
    (n_connected, n_total)). Progress weights follow the reference:
    keypoints 1/6, matching 1/6, BA 1/3, seams/warp ~1/3 (SURVEY §5).
    """
    from simplepanorama_tpu.features import extract_features
    from simplepanorama_tpu.adjacency import build_adjacency
    from simplepanorama_tpu.geometry.graph import connected_components
    from simplepanorama_tpu.geometry.focal import focal_from_hom
    from simplepanorama_tpu.stitch import bundle_adjust_stitching
    from simplepanorama_tpu.utils.timing import stage

    cancelled = (cancel_token.cancelled if cancel_token is not None
                 else None)

    def prog(stage_delta, text=None):
        if progress is not None:
            progress.add(stage_delta, text)

    if progress is not None:
        progress.set(0.0, "Calculating Keypoints...")
    with stage("load"):
        # streaming decode: the pool starts here, SIFT chunks consume
        # images as they complete (features._extract_arrays_stream), so
        # decode overlaps device compute instead of serializing in front
        # of it (the reference's lazy load, _image.cpp:29-73, never pays
        # decode serially either)
        pending = images.load_resized_stream(cfg.init_size, cfg.threads)
        if pending is not None and images.img_data:
            # mixed state (some images already loaded): materialize
            pending.finalize()
            pending = None
    n_total = len(images.img_data) if pending is None else len(pending)
    if n_total < 2:
        if pending is not None:
            pending.finalize()
        raise RuntimeError("Need at least two images")

    with stage("keypoints"):
        feats = extract_features(
            pending if pending is not None else images.img_data, cfg,
            progress=lambda d: prog(d / 6.0),
            cancelled=cancelled)
    if pending is not None:       # no-op if extraction already finalized
        pending.finalize()

    if progress is not None:
        progress.set(1 / 6, "Matching Images...")
    sizes = [im.shape[:2] for im in images.img_data]
    with stage("matching"):
        adjres = build_adjacency(
            feats, sizes, cfg,
            progress=lambda d: prog(d / 6.0),
            cancelled=cancelled)

    comps = connected_components(adjres.adj)
    comp = comps[0]
    if len(comp.nodes) < 2:
        raise RuntimeError("Images could not be connected")

    focal = focal_from_hom(adjres.hom_mat, adjres.adj)
    if focal <= 0:
        focal = float(cfg.focal)

    if progress is not None:
        progress.set(2 / 6, "Adjusting Panorama...")
    with stage("bundle_adjust"):
        res = bundle_adjust_stitching(
            comp, adjres, sizes, focal, cfg,
            progress=lambda d: prog(d / 3.0),
            cancelled=cancelled)

    if progress is not None:
        progress.set(4 / 6, "Projecting Images...")
    comp_imgs = [images.img_data[g] for g in res.nodes]
    dev_images = None
    if getattr(feats, "device_images", None) is not None:
        dev_images = (feats.device_images, list(res.nodes))
    with stage("compositing"):
        params = set_config(res, comp_imgs, cfg,
                            progress=lambda d: prog(d / 3.0),
                            cancelled=cancelled, dev_images=dev_images)
    if progress is not None:
        progress.set(1.0, "Done")
    return res, params, (len(comp.nodes), n_total)


def render_full_from_imageset(params: StitchParams, cfg: Config,
                              images) -> np.ndarray:
    """Full-res render driven by an io.ImageSet (panorama::get_panorama ->
    return_full: full-res decode of only the connected images,
    _image.cpp:76-91)."""
    res = params.res
    connected = [False] * len(images.loaded)
    for g in res.nodes:
        connected[g] = True
    full = images.load_connected_images(connected, cfg.threads)
    comp_full = [full[g] for g in res.nodes]
    return render_full(params, cfg, comp_full)
