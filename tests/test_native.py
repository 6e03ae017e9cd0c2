"""Native components: C gilbert parity with Python, embedding store IO."""

import numpy as np
import pytest

from blade import native
from blade.attention.gilbert import gilbert_permutations


@pytest.mark.skipif(not native.native_available(), reason="no C toolchain")
def test_native_gilbert_matches_python():
    for (w, h, d) in [(4, 4, 4), (8, 6, 4), (45, 30, 13), (52, 30, 21)]:
        flat = native.gilbert3d_flat(w, h, d)
        assert flat is not None
        perm, _ = gilbert_permutations(w, h, d)
        np.testing.assert_array_equal(flat, perm)


def test_embed_store_roundtrip(tmp_path):
    npy_dir = tmp_path / "emb"
    npy_dir.mkdir()
    data = [np.random.randn(1, 4, 8).astype(np.float32) for _ in range(5)]
    for i, arr in enumerate(data):
        np.save(npy_dir / f"{i}.npy", arr)
    packed = str(tmp_path / "store.bin")
    meta = native.pack_embeddings(str(npy_dir), packed)
    assert meta["count"] == 5

    store = native.EmbedStore(packed)
    assert len(store) == 5
    store.prefetch([3, 4])
    for i, arr in enumerate(data):
        np.testing.assert_array_equal(store.get(i), arr)
    with pytest.raises(Exception):
        store.get(99)
    store.close()
