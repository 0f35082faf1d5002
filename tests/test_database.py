"""Database layer: reference-schema round trips, pair-id packing, resume."""

import numpy as np

from monocularsfm_tpu.database import Database
from monocularsfm_tpu.types import image_pair_to_pair_id, pair_id_to_image_pair


def test_pair_id_packing():
    # Reference packing: pair_id = 10000*min + max (Database.cpp:656-694).
    assert image_pair_to_pair_id(3, 7) == 30007
    assert image_pair_to_pair_id(7, 3) == 30007
    assert pair_id_to_image_pair(30007) == (3, 7)


def test_round_trips(tmp_path, rng):
    db = Database(tmp_path / "t.db")
    i1 = db.write_image("a.jpg")
    i2 = db.write_image("b.jpg")
    assert db.read_image_id("a.jpg") == i1
    assert db.read_image_name(i2) == "b.jpg"
    assert db.num_images() == 2
    assert db.read_all_images() == {i1: "a.jpg", i2: "b.jpg"}

    kps = rng.random((100, 4)).astype(np.float32)
    colors = (rng.random((100, 3)) * 255).astype(np.uint8)
    desc = rng.random((100, 128)).astype(np.float32)
    db.write_keypoints(i1, kps)
    db.write_keypoints_color(i1, colors)
    db.write_descriptors(i1, desc)
    np.testing.assert_array_equal(db.read_keypoints(i1), kps)
    np.testing.assert_array_equal(db.read_keypoints_color(i1), colors)
    np.testing.assert_array_equal(db.read_descriptors(i1), desc)
    assert db.exist_keypoints(i1) and not db.exist_keypoints(i2)

    m = rng.integers(0, 100, size=(40, 2)).astype(np.int32)
    db.write_matches(i1, i2, m)
    np.testing.assert_array_equal(db.read_matches(i1, i2), m)
    # Swapped query returns swapped columns.
    np.testing.assert_array_equal(db.read_matches(i2, i1), m[:, ::-1])
    assert db.exist_matches(i2, i1)
    assert db.num_matches() == 1
    all_m = db.read_all_matches()
    np.testing.assert_array_equal(all_m[(min(i1, i2), max(i1, i2))], m)
    db.close()


def test_resume_semantics(tmp_path, rng):
    # Re-opening the same file must see previous state (idempotent resume,
    # reference FeatureExtraction.cpp:83-100).
    path = tmp_path / "r.db"
    db = Database(path)
    i1 = db.write_image("x.jpg")
    db.write_keypoints(i1, rng.random((10, 4)).astype(np.float32))
    db.close()
    db2 = Database(path)
    assert db2.exist_image("x.jpg")
    assert db2.exist_keypoints(db2.read_image_id("x.jpg"))
    db2.close()
