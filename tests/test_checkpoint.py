import numpy as np
import pytest

from clima_tpu.data import make_template_dir
from clima_tpu.adiabat import AdiabatClimate
from clima_tpu.utils.checkpoint import save_state, restore_state, save_pytree, load_pytree


@pytest.fixture(scope="module")
def c(tmp_path_factory):
    root = tmp_path_factory.mktemp("template_ckpt")
    t = make_template_dir(str(root), nz=12, n_zenith=1)
    c = AdiabatClimate(t["species"], t["settings"], t["star"], t["datadir"])
    c.verbose = False
    return c


def test_state_roundtrip(c, tmp_path):
    P_i = np.full(c.sp.ng, 1.0e-15)
    P_i[c.species_names.index("H2O")] = 270.0e6
    P_i[c.species_names.index("N2")] = 1.0e6
    c.make_profile(280.0, P_i)
    T_ref = c.T.copy()

    fn = str(tmp_path / "state.npz")
    save_state(c, fn)

    c.make_profile(300.0, P_i)  # clobber
    assert not np.allclose(c.T, T_ref)
    restore_state(c, fn)
    np.testing.assert_allclose(c.T, T_ref, rtol=1e-14)
    assert c.T_surf == 280.0


def test_pytree_roundtrip(tmp_path):
    tree = {"a": np.arange(5.0), "b": (np.ones((2, 3)), np.asarray(2.0))}
    fn = str(tmp_path / "tree.npz")
    save_pytree(tree, fn)
    out = load_pytree(fn, tree)
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"][0], tree["b"][0])
