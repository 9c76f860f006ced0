"""The hard-case miner must produce pipeline-faithful training states."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import make_sphere
from dipole_tpu.utils.io import export_pc


def test_mine_cloud_states_are_labeled_against_gt(tmp_path):
    from tools.mine_hard_cases import mine_cloud

    cloud = tmp_path / "sphere.xyz"
    export_pc(make_sphere(700, seed=11), cloud)
    # no models: captures the orient_center init + post-cascade states
    patches, labels = mine_cloud(str(cloud), models=[], iters=11,
                                 number_parts=3, min_patch=20,
                                 curvature=0.0, keep_clean_frac=1.0)
    assert patches, "miner produced no states"
    for p, l in zip(patches, labels):
        assert p.shape == (len(l), 6)
        assert p.dtype == np.float32
        assert set(np.unique(l)) <= {0, 1}
        assert l.mean() >= 0.5  # majority-keep gauge resolved
    # at least one post-propagation capture beyond the init snapshot
    # (iters=11 crosses the it%10 propagation point once)
    sizes = [len(p) for p in patches]
    assert len(sizes) >= 2


def test_shipped_mined_states_load_and_hold_invariants():
    """train_data/mined_states_r4.npz is the recipe-5 training input; the
    pickle-free loader must reproduce the miner's per-state invariants."""
    from tools.train_r6 import MINED_DEFAULT, load_mined

    assert MINED_DEFAULT.exists()
    states = load_mined(MINED_DEFAULT)
    assert len(states) == 199
    for p, l in states:
        assert p.shape == (len(l), 6) and p.dtype == np.float32
        assert set(np.unique(l)) <= {0, 1}
        assert l.mean() >= 0.5
