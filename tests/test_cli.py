"""CLI wiring: config round-trip + dataset/model dispatch."""
import json

import pytest

from dodt_tpu import cli, config as cfg_mod
from dodt_tpu.data import synthetic


def test_config_roundtrip(tmp_path):
    cfg = cfg_mod.cars_dt_tracking(data_stride=3)
    path = str(tmp_path / "cfg.json")
    cfg.save(path)
    loaded = cfg_mod.PipelineConfig.load(path)
    assert loaded.dataset.data_stride == 3
    assert loaded.model.rpn.train_nms_size == 1024
    assert loaded.model.avod.nms_iou_thresh == 0.01
    assert loaded.dataset.kitti_utils.area_extents[0] == (-40.0, 40.0)
    assert loaded.model.correlation.max_displacement == 5
    assert loaded.dataset.kitti_utils.bev_shape == (700, 800)


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    t_root = str(tmp_path_factory.mktemp("cli_tracking"))
    synthetic.write_tracking_fixture(t_root, num_videos=1, num_frames=4)
    d_root = str(tmp_path_factory.mktemp("cli_object"))
    synthetic.write_detection_fixture(d_root, num_frames=3)
    return t_root, d_root


def _tiny(root, model_name, stride=1):
    cfg = cfg_mod.unittest_pipeline()
    cfg.model.model_name = model_name
    cfg.dataset.dataset_dir = root
    cfg.dataset.data_stride = stride
    cfg.dataset.video_train_ids = (0,)
    return cfg


def test_build_dispatch(roots, tmp_path):
    t_root, d_root = roots
    from dodt_tpu.models.dt_avod import DtAvodNet
    from dodt_tpu.models.stack import StackAvodNet
    from dodt_tpu.data.detection import KittiDataset
    from dodt_tpu.data.tracking import KittiTrackingDataset
    from dodt_tpu.data.stack import KittiTrackingStackDataset

    for name, root, ds_cls, model_cls, frames in (
            ("avod_model", d_root, KittiDataset, DtAvodNet, 1),
            ("dt_avod_model", t_root, KittiTrackingDataset, DtAvodNet, 2),
            ("stack_avod_model", t_root, KittiTrackingStackDataset,
             StackAvodNet, None)):
        cfg = _tiny(root, name, stride=2 if name.startswith("stack")
                    else 1)
        path = str(tmp_path / f"{name}.json")
        cfg.save(path)
        built_cfg, ds, model = cli._build(path, "train")
        assert isinstance(ds, ds_cls), name
        assert isinstance(model, model_cls), name
        if frames is not None and isinstance(model, DtAvodNet):
            assert model.num_frames == frames


def test_single_frame_clusters(roots, tmp_path):
    """Cluster selection for single-frame datasets: a Car config on the
    Car fixture computes clusters from the dataset's own labels; a
    Pedestrian config gets pedestrian-sized priors, never Car sizes
    (reference label_cluster_utils.get_clusters:146 serves KittiDataset
    and tracking datasets alike)."""
    _, d_root = roots
    from dodt_tpu.data.detection import KittiDataset
    from dodt_tpu.data.clusters import compute_clusters

    cfg = _tiny(d_root, "avod_model")
    ds = KittiDataset(cfg.dataset, split="train")
    car = compute_clusters(ds, 2, "Car")
    assert car.shape == (2, 3)
    assert 3.0 < car[:, 0].mean() < 5.0      # fixture Car lengths

    # no Pedestrian labels in the fixture -> per-class priors
    ped = compute_clusters(ds, 1, "Pedestrian")
    assert ped.shape == (1, 3)
    assert ped[0, 0] < 1.5                   # not Car-sized

    # end-to-end: a Pedestrian single-frame config through cli._build
    cfg.dataset.classes = ("Pedestrian",)
    cfg.dataset.num_clusters = (1,)
    path = str(tmp_path / "ped_cfg.json")
    cfg.save(path)
    _, _, model = cli._build(path, "train")
    assert model.cluster_sizes[0][0] < 1.5


def test_demo_command(roots, tmp_path):
    t_root, _ = roots
    cfg = _tiny(t_root, "dt_avod_model")
    cfg_path = str(tmp_path / "demo_cfg.json")
    cfg.save(cfg_path)
    out_dir = str(tmp_path / "demo_out")
    from dodt_tpu import cli
    cli.main(["demo", "--config", cfg_path, "--output_dir", out_dir,
              "--sample", "0"])
    import os
    assert os.path.exists(os.path.join(out_dir, "bev_sample.png"))
    assert os.path.exists(os.path.join(out_dir, "anchor_grid.png"))
    assert os.path.exists(os.path.join(out_dir, "dataset_stats.json"))
