import numpy as np

from dqmc_tpu.lattice import Lattice, pbc_shortest, square_lattice


def test_square_basic():
    lat = square_lattice(4, 6)
    assert lat.n_cells == 24
    assert lat.n_sites == 24
    assert lat.n_orb == 1


def test_site_indexing_and_neighbors():
    lat = square_lattice(4, 4)
    # site = (uy*L1 + ux) * n_orb + orb
    assert lat.site_to_unitcellpos(0) == (0, 0)
    assert lat.site_to_unitcellpos(5) == (1, 1)
    # +x neighbor wraps around
    assert lat.site_neighbor(3, (1, 0), 0) == 0
    assert lat.site_neighbor(0, (1, 0), 0) == 1
    # +y neighbor
    assert lat.site_neighbor(0, (0, 1), 0) == 4
    assert lat.site_neighbor(12, (0, 1), 0) == 0  # wraps
    nm = lat.neighbor_map((1, 0))
    assert nm[3] == 0 and nm[0] == 1


def test_positions():
    lat = square_lattice(3, 3)
    np.testing.assert_allclose(lat.site_position(4), [1.0, 1.0])
    np.testing.assert_allclose(lat.site_position(2), [2.0, 0.0])


def test_kpoints_in_bz_even():
    lat = square_lattice(6, 6)
    # range -L/2+1 .. L/2 in units of 2pi/L -> k in (-pi, pi]
    ks = lat.k_points
    assert ks.shape == (36, 2)
    assert ks.max() <= np.pi + 1e-12
    assert ks.min() > -np.pi - 1e-12
    # flat index kidx = n*L2 + m
    np.testing.assert_allclose(ks[0], [(-2) * 2 * np.pi / 6, (-2) * 2 * np.pi / 6])


def test_pbc_shortest():
    assert pbc_shortest(5, 6) == -1
    assert pbc_shortest(3, 6) == 3
    assert pbc_shortest(-3, 6) == 3
    assert pbc_shortest(2, 6) == 2
    assert pbc_shortest(-2, 5) == -2
    assert pbc_shortest(3, 5) == -2


def test_displacement_table_roundtrip():
    lat = square_lattice(4, 4)
    T = lat.displacement_table()
    assert T.shape == (4, 4, 16)
    # zero displacement index (offset L/2-1 for even L) maps cell -> itself
    off = 4 // 2 - 1
    np.testing.assert_array_equal(T[off, off], np.arange(16))
    # displacement (1, 0): cell 0 -> cell 1
    assert T[off + 1, off, 0] == 1


def test_kspace_phases_unitarity():
    lat = square_lattice(4, 4)
    P = lat.kspace_phases().reshape(16, 16)
    # DFT matrix times its conjugate transpose = N * I
    np.testing.assert_allclose(P @ P.conj().T, 16 * np.eye(16), atol=1e-10)


def test_save_info(tmp_path):
    lat = square_lattice(6, 6)
    f = tmp_path / "results" / "info"
    lat.save_info(f)
    text = f.read_text().splitlines()
    assert text[0] == "L1 6"
    assert text[2] == "n_orb 1"
    assert text[3] == "a1_x 1"
