"""Resume / extend an existing reconstruction.

`resume_from_bundle` rebuilds optimizer state from a loaded bundle file —
the role of `InitializeBundleAdjust` (`src/Bundle.cpp:989-1108`, used by
`--bundle file` + `--rerun_bundle`/`--add_images`,
`src/BundlerApp.cpp:839-853, 996-1021`).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from bundler_sfm_tpu.io.bundlefile import BundleFile
from bundler_sfm_tpu.pipeline.incremental import Reconstruction, log
from bundler_sfm_tpu.pipeline.scene import Scene


def resume_from_bundle(scene: Scene, bundle: BundleFile) -> Reconstruction:
    """Rebuild a Reconstruction from a BundleFile against `scene`'s tracks.

    Requires scene.key_track (i.e. geometric constraints computed or loaded)
    so that existing points can be re-linked to tracks; views whose (img,
    key) no longer maps to a track keep their observation but no track link.
    """
    added_order = [i for i, c in enumerate(bundle.cameras) if c.registered]
    slot_of_img = {img: s for s, img in enumerate(added_order)}
    cam_R: List[np.ndarray] = []
    cam_params: List[np.ndarray] = []
    for img in added_order:
        cam = bundle.cameras[img]
        cam_R.append(cam.R.copy())
        cam_params.append(np.concatenate([
            cam.center, np.zeros(3), [cam.f], [cam.k1], [cam.k2]]))

    recon = Reconstruction(
        added_order=added_order,
        cam_R=cam_R, cam_params=cam_params,
        points=[], colors=[], pt_views=[],
        track_extra=np.full(len(scene.tracks), -1, dtype=np.int64),
        key_extra=[dict() for _ in range(scene.num_images)],
    )
    n_linked = 0
    for p in bundle.points:
        pt_idx = len(recon.points)
        recon.points.append(p.pos.copy())
        recon.colors.append(p.color.copy())
        views = []
        for v in p.views:
            img, key = int(v[0]), int(v[1])
            slot = slot_of_img.get(img)
            if slot is None:
                continue
            views.append((slot, key))
            recon.key_extra[img][key] = pt_idx
            tr = scene.key_track[img].get(key) if scene.key_track else None
            if tr is not None:
                recon.track_extra[tr] = pt_idx
                n_linked += 1
        recon.pt_views.append(views)
    log(f"[InitializeBundleAdjust] Resumed {len(added_order)} cameras, "
        f"{len(recon.points)} points ({n_linked} track links)")
    return recon


def continue_reconstruction(scene: Scene, recon: Reconstruction,
                            out_dir: Optional[str] = None,
                            seed: int = 0) -> Reconstruction:
    """Continue the incremental loop from a resumed state (the num_init_cams
    > 0 branch of BundleAdjustFast, `src/BundleFast.cpp:236-260`)."""
    from bundler_sfm_tpu.pipeline import incremental as inc

    cfg = scene.config
    round_id = 0
    while recon.num_cameras < scene.num_images:
        counts = inc.find_candidate_images(recon, scene)
        if not counts:
            break
        max_matches = max(counts.values())
        if max_matches < cfg.min_max_matches:
            break
        n_needed = int(round(0.75 * max_matches))
        if cfg.num_matches_add_camera > 0:
            n_needed = min(n_needed, cfg.num_matches_add_camera)
        batch_imgs = [i for i, c in counts.items() if c >= n_needed]
        added_any = False
        for img in batch_imgs:
            if inc.bundle_initialize_image(recon, scene, img,
                                           recon.num_cameras,
                                           seed=seed + 31 * img):
                added_any = True
            else:
                scene.ignore_in_bundle[img] = True
        if not added_any:
            round_id += 1
            continue
        if not cfg.skip_add_points:
            inc.add_all_new_points(recon, scene)
        if not cfg.skip_full_bundle:
            inc.run_sfm(recon, scene)
            inc.remove_bad_points(recon, scene)
        if out_dir:
            inc.dump_round(recon, scene, out_dir, recon.num_cameras)
        round_id += 1
    return recon
