"""Gilbert curve + token reordering tests (reference:
``Triton/tests/test_gilbert_rearranger.py`` checks — bijectivity, shapes,
text preservation, round trip — plus the adjacency/locality property)."""

import jax.numpy as jnp
import numpy as np
import pytest

from blade.attention.gilbert import (
    gilbert3d_coords,
    gilbert_permutations,
    rearrange_tokens,
    unrearrange_tokens,
)

GEOMETRIES = [
    (4, 4, 4),
    (8, 6, 4),
    (45, 30, 13),  # CogVideoX 480x720, 49 frames
    (52, 30, 21),  # Wan 480x832, 81 frames
    (5, 3, 2),
    (1, 7, 3),
]


@pytest.mark.parametrize("w,h,d", GEOMETRIES)
def test_curve_visits_every_cell_once(w, h, d):
    coords = gilbert3d_coords(w, h, d)
    assert coords.shape == (w * h * d, 3)
    assert coords[:, 0].min() >= 0 and coords[:, 0].max() == w - 1
    assert coords[:, 1].min() >= 0 and coords[:, 1].max() == h - 1
    assert coords[:, 2].min() >= 0 and coords[:, 2].max() == d - 1
    flat = coords[:, 0] + w * (coords[:, 1] + h * coords[:, 2])
    assert len(np.unique(flat)) == w * h * d


@pytest.mark.parametrize("w,h,d", [(4, 4, 4), (8, 6, 4), (45, 30, 13)])
def test_curve_locality(w, h, d):
    """Consecutive curve positions should overwhelmingly be unit steps."""
    coords = gilbert3d_coords(w, h, d)
    steps = np.abs(np.diff(coords, axis=0)).sum(axis=1)
    adjacency = float((steps == 1).mean())
    assert adjacency > 0.99, f"adjacency {adjacency} too low"


@pytest.mark.parametrize("w,h,d", [(4, 4, 4), (45, 30, 13)])
def test_permutations_inverse(w, h, d):
    perm, inv = gilbert_permutations(w, h, d)
    n = w * h * d
    assert np.array_equal(np.sort(perm), np.arange(n))
    assert np.array_equal(perm[inv], np.arange(n))
    assert np.array_equal(inv[perm], np.arange(n))


def test_roundtrip_with_text():
    w, h, d = 6, 4, 3
    text_len = 5
    perm, inv = gilbert_permutations(w, h, d)
    n = w * h * d
    x = jnp.arange((text_len + n) * 2, dtype=jnp.float32).reshape(1, text_len + n, 2)
    y = rearrange_tokens(x, perm, text_length=text_len)
    assert y.shape == x.shape
    # Text moved to the end, contents preserved.
    np.testing.assert_array_equal(np.asarray(y[:, -text_len:]), np.asarray(x[:, :text_len]))
    # Round trip restores the original layout exactly.
    z = unrearrange_tokens(y, inv, text_length=text_len)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_roundtrip_without_text():
    w, h, d = 4, 4, 2
    perm, inv = gilbert_permutations(w, h, d)
    x = jnp.arange(w * h * d * 3, dtype=jnp.float32).reshape(1, w * h * d, 3)
    y = rearrange_tokens(x, perm)
    z = unrearrange_tokens(y, inv)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
    # It actually permutes (not identity) for non-trivial grids.
    assert not np.array_equal(np.asarray(y), np.asarray(x))
