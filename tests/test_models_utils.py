"""Camera-model registry (models/) and telemetry (utils/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from bundler_sfm_tpu.models import (
    CAMERA_MODELS, FisheyeModel, KnownIntrinsicsModel, SnavelyModel,
    SnavelyQuaternionModel, get_camera_model,
)
from bundler_sfm_tpu.ops.fisheye import FisheyeParams, undistort_points
from tests.synthetic import look_at_rotation, project


def test_registry():
    assert get_camera_model("snavely") is SnavelyModel
    with pytest.raises(ValueError):
        get_camera_model("nope")
    assert set(CAMERA_MODELS) >= {"snavely", "snavely_quaternion",
                                  "known_intrinsics", "fisheye"}


def test_quaternion_matches_angle_axis(rng):
    """Both parameterizations project identically
    (snavely_reprojection_error.h:53-96 vs :103-151)."""
    c = np.array([1.0, -2.0, 5.0])
    R = look_at_rotation(c, np.zeros(3))
    f, k1, k2 = 700.0, -0.04, 0.06
    X = rng.normal(size=(20, 3))
    cam9 = jnp.concatenate([jnp.asarray(c), jnp.zeros(3),
                            jnp.asarray([f, k1, k2])])
    t = -R @ c
    camq = SnavelyQuaternionModel.from_rt(jnp.asarray(R), jnp.asarray(t),
                                          f, k1, k2)
    # Unnormalized quaternion must give the same rotation.
    camq_scaled = camq.at[0:4].multiply(1.7)
    for Xi in X:
        pa = SnavelyModel.project(cam9, jnp.asarray(R), jnp.asarray(Xi))
        pq = SnavelyQuaternionModel.project(camq, None, jnp.asarray(Xi))
        pqs = SnavelyQuaternionModel.project(camq_scaled, None,
                                             jnp.asarray(Xi))
        gt = project(R, c, f, k1, k2, Xi[None])[0]
        assert np.allclose(np.asarray(pa), gt, atol=1e-9)
        assert np.allclose(np.asarray(pq), gt, atol=1e-8)
        assert np.allclose(np.asarray(pqs), gt, atol=1e-8)


def test_known_intrinsics_model(rng):
    c = np.array([0.5, 0.1, 4.0])
    R = look_at_rotation(c, np.zeros(3))
    f = 650.0
    X = rng.normal(size=3)
    p6 = jnp.concatenate([jnp.asarray(c), jnp.zeros(3)])
    out = KnownIntrinsicsModel.project(p6, (jnp.asarray(R), f, 0.0, 0.0),
                                       jnp.asarray(X))
    gt = project(R, c, f, 0, 0, X[None])[0]
    assert np.allclose(np.asarray(out), gt, atol=1e-9)


def test_fisheye_model_roundtrip(rng):
    fp = FisheyeParams(fCx=2.0, fCy=-3.0, fRad=600.0, fAngle=180.0,
                       fFocal=400.0)
    c = np.array([0.0, 0.0, 6.0])
    R = look_at_rotation(c, np.zeros(3))
    cam9 = jnp.concatenate([jnp.asarray(c), jnp.zeros(3),
                            jnp.asarray([400.0, 0.0, 0.0])])
    X = rng.normal(size=(10, 3)) * 0.5
    for Xi in X:
        d = FisheyeModel.project(cam9, (jnp.asarray(R), fp), jnp.asarray(Xi))
        # Undistorting the fisheye pixel recovers the pinhole projection.
        u = undistort_points(np.asarray(d)[None], fp)[0]
        gt = project(R, c, 400.0, 0, 0, Xi[None])[0]
        assert np.allclose(np.asarray(u), gt, atol=1e-6)


def test_telemetry_stages_counters():
    from bundler_sfm_tpu.utils import get_telemetry, stage, counter
    t = get_telemetry()
    t.reset()
    with stage("match"):
        counter("pairs_matched", 100)
    counter("images_registered", 3)
    rep = t.report()
    assert rep["counters"]["pairs_matched"] == 100
    assert rep["stages_s"]["match"] >= 0
    assert "pairs_matched_per_s" in rep["rates"]
    t.reset()
    assert t.report()["counters"] == {}


def test_telemetry_wired_into_pipeline(rng, tmp_path):
    from bundler_sfm_tpu.utils import get_telemetry
    from tests.test_pipeline import make_pipeline_scene
    from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints
    from bundler_sfm_tpu.pipeline.incremental import bundle_adjust_fast
    t = get_telemetry()
    t.reset()
    scene, syn = make_pipeline_scene(rng, num_cams=4, num_pts=120)
    compute_geometric_constraints(scene, seed=3)
    bundle_adjust_fast(scene, out_dir=str(tmp_path), seed=5)
    rep = t.report()
    assert rep["counters"]["pairs_verified"] == 6
    assert rep["counters"]["images_registered"] >= 2
    assert rep["counters"]["ba_observations"] > 0
    assert rep["stages_s"]["verify"] > 0
    assert rep["stages_s"]["ba"] > 0
    assert rep["stages_s"]["total"] > 0
    t.dump(str(tmp_path / "telemetry.json"))
    import json
    assert json.load(open(tmp_path / "telemetry.json"))["rates"]
    t.reset()
