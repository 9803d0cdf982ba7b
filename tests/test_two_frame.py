import io

import numpy as np
import pytest

from tests.test_pipeline import make_pipeline_scene

from bundler_sfm_tpu.pipeline.two_frame import (
    bundle_two_frame, compute_model_table, write_relative_poses,
)
from bundler_sfm_tpu.pipeline.verify import compute_geometric_constraints


@pytest.mark.slow
def test_two_frame_model(rng, tmp_path):
    scene, syn = make_pipeline_scene(rng, num_cams=3, num_pts=150)
    compute_geometric_constraints(scene, seed=2)
    m = bundle_two_frame(scene, 0, 1, seed=4)
    assert m is not None
    assert m.num_points > 80
    assert m.error < 1.5
    assert m.angle > 1.0
    # Relative pose up to scale matches ground truth.
    R_rel_true = syn.R[1] @ syn.R[0].T
    R_rel = m.R1 @ m.R0.T
    assert np.abs(R_rel - R_rel_true).max() < 0.05
    # Covariances are symmetric PSD-ish.
    for C in (m.C0, m.C1):
        assert np.allclose(C, C.T, atol=1e-9)
        assert np.all(np.linalg.eigvalsh(C) > -1e-9)

    # Serialization writes a well-formed record.
    buf = io.StringIO()
    m.write(buf)
    lines = buf.getvalue().splitlines()
    assert int(lines[0]) == m.num_points
    assert len(lines) == 3 + m.num_points + 2 * 3 + 2

    # Model table + relpose export over all pairs.
    models = compute_model_table(scene, seed=9)
    assert len(models) == 3
    out = tmp_path / "relposes.txt"
    write_relative_poses(str(out), models)
    assert int(out.read_text().splitlines()[0]) == 3
