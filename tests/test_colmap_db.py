"""COLMAP sqlite database + known-pose model writer tests."""

import numpy as np

from gaustudio_tpu.utils import colmap_db as cdb
from gaustudio_tpu.datasets import utils as dsu


def test_database_roundtrip(tmp_path):
    db_path = str(tmp_path / "database.db")
    db = cdb.COLMAPDatabase.connect(db_path)
    db.create_tables()
    cam_id = db.add_camera("PINHOLE", 64, 48, [50.0, 51.0, 32.0, 24.0])
    im1 = db.add_image("a.png", cam_id)
    im2 = db.add_image("b.png", cam_id)
    kps = np.random.default_rng(0).uniform(0, 64, (10, 2)).astype(np.float32)
    db.add_keypoints(im1, kps)
    matches = np.array([[0, 1], [2, 3]], np.uint32)
    db.add_matches(im1, im2, matches)
    db.add_two_view_geometry(im1, im2, matches)
    db.commit()

    rows = db.execute("SELECT camera_id, model, width, height FROM cameras").fetchall()
    assert rows == [(cam_id, 1, 64, 48)]
    names = [r[0] for r in db.execute("SELECT name FROM images ORDER BY image_id")]
    assert names == ["a.png", "b.png"]
    (pair_id, r, c, blob) = db.execute(
        "SELECT pair_id, rows, cols, data FROM matches").fetchone()
    assert cdb.pair_id_to_image_ids(pair_id) == (im1, im2)
    np.testing.assert_array_equal(
        cdb.blob_to_array(blob, np.uint32, (r, c)), matches)
    db.close()


def test_known_pose_model_files(tmp_path):
    model_dir = str(tmp_path / "model")
    cdb.create_cameras_and_points_bin(
        model_dir, {1: {"width": 64, "height": 48, "fx": 50, "fy": 51,
                        "cx": 32, "cy": 24}}
    )
    pose = np.eye(4)
    pose[:3, 3] = [1, 2, 3]
    cdb.create_images_from_pose_dict(model_dir, {"a.png": pose, "b.png": pose})

    cams = dsu.read_intrinsics_binary(f"{model_dir}/cameras.bin")
    assert cams[1].model == "PINHOLE"
    ims = dsu.read_extrinsics_binary(f"{model_dir}/images.bin")
    assert len(ims) == 2
    np.testing.assert_allclose(ims[1].tvec, [1, 2, 3])
    txt = dsu.read_extrinsics_text(f"{model_dir}/images.txt")
    assert len(txt) == 2
