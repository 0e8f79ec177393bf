"""Tests: mIoU confusion-matrix math + config system."""

import os

import numpy as np

from preworld_tpu.metrics import (
    MetricFScore,
    MetricMIoU,
    MetricMIoUTemporal,
    fast_hist,
)
from preworld_tpu.utils import Config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "preworld")


class TestFScore:
    """Hand-computed chamfer cases (reference `occ_metrics.py:322-410`)."""

    def _metric(self, **kw):
        # unit voxels anchored at the origin: voxel (i,j,k) -> center +0.5
        kw.setdefault("voxel_size", (1.0, 1.0, 1.0))
        kw.setdefault("pc_range", (0, 0, 0, 4, 4, 2))
        kw.setdefault("void", (17, 255))
        return MetricFScore(**kw)

    def test_hand_computed_chamfer(self):
        """gt {(0,0,0),(2,2,1)}, pred {(0,0,0),(3,2,1)}: one exact match,
        one pair 1.0 m apart -> acc = cmpl = 0.5 at the 0.6 m threshold,
        f1 = 2/(1/0.5 + 1/0.5) = 0.5."""
        m = self._metric()
        gt = np.full((4, 4, 2), 17, np.int64)
        pred = np.full((4, 4, 2), 17, np.int64)
        gt[0, 0, 0] = 3
        gt[2, 2, 1] = 5
        pred[0, 0, 0] = 3
        pred[3, 2, 1] = 5
        m.add_batch(pred, gt)
        res = m.count_fscore()
        assert abs(res["accuracy"] - 0.5) < 1e-6
        assert abs(res["completeness"] - 0.5) < 1e-6
        assert abs(res["fscore"] - 0.5) < 1e-4

    def test_threshold_admits_neighbor(self):
        """Same geometry with a 1.1 m threshold: the 1.0 m pair now counts
        -> perfect scores."""
        m = self._metric(threshold_acc=1.1, threshold_complete=1.1)
        gt = np.full((4, 4, 2), 17, np.int64)
        pred = np.full((4, 4, 2), 17, np.int64)
        gt[0, 0, 0] = 3
        gt[2, 2, 1] = 5
        pred[0, 0, 0] = 3
        pred[3, 2, 1] = 5
        m.add_batch(pred, gt)
        res = m.count_fscore()
        assert res["fscore"] > 0.999

    def test_camera_mask_and_averaging(self):
        """Masked-out voxels become void (255) pre-chamfer, and per-sample
        scores average: (0.5 + 1.0) / 2 = 0.75."""
        m = self._metric(use_image_mask=True)
        gt = np.full((4, 4, 2), 17, np.int64)
        pred = np.full((4, 4, 2), 17, np.int64)
        gt[0, 0, 0] = 3
        gt[2, 2, 1] = 5
        pred[0, 0, 0] = 3
        pred[3, 2, 1] = 5
        m.add_batch(pred, gt, mask_camera=np.ones((4, 4, 2), bool))
        # second sample: the mask hides the mismatched pair -> perfect
        mask = np.ones((4, 4, 2), bool)
        mask[2, 2, 1] = mask[3, 2, 1] = False
        m.add_batch(pred, gt, mask_camera=mask)
        res = m.count_fscore()
        assert res["count"] == 2
        assert abs(res["accuracy"] - 0.75) < 1e-6
        assert abs(res["fscore"] - 0.75) < 1e-3


class TestMIoU:
    def test_perfect_prediction(self):
        m = MetricMIoU(use_image_mask=False)
        gt = np.random.default_rng(0).integers(0, 18, (20, 20, 4))
        m.add_batch(gt, gt)
        res = m.count_miou()
        assert res["mIoU"] == 100.0

    def test_hist_excludes_255(self):
        gt = np.array([0, 1, 255, 17])
        pred = np.array([0, 2, 5, 17])
        h = fast_hist(pred, gt, 18)
        assert h.sum() == 3  # 255 excluded
        assert h[1, 2] == 1 and h[0, 0] == 1 and h[17, 17] == 1

    def test_camera_mask(self):
        m = MetricMIoU(use_image_mask=True)
        gt = np.zeros((4, 4, 2), np.int64)
        pred = np.ones((4, 4, 2), np.int64)
        mask = np.zeros((4, 4, 2), bool)
        mask[0, 0, 0] = True
        pred[0, 0, 0] = 0
        m.add_batch(pred, gt, mask_camera=mask)
        res = m.count_miou()
        assert res["per_class"]["others"] == 100.0

    def test_known_iou_value(self):
        """2-class toy: IoU(class0) = 1/3 by hand."""
        m = MetricMIoU(num_classes=2, use_image_mask=False)
        gt = np.array([0, 0, 1, 1])
        pred = np.array([0, 1, 0, 1])
        m.add_batch(pred, gt)
        iou = np.diag(m.hist) / (
            m.hist.sum(1) + m.hist.sum(0) - np.diag(m.hist)
        )
        np.testing.assert_allclose(iou, [1 / 3, 1 / 3])

    def test_temporal_avg(self):
        m = MetricMIoUTemporal()
        gt = np.random.default_rng(1).integers(0, 18, (10, 10, 2))
        m.add_batch({h: gt for h in (0, 1, 2, 3)}, {h: gt for h in (0, 1, 2, 3)})
        res = m.count_miou()
        assert res["mIoU_avg_1_3s"] == 100.0


class TestTemporalProtocol:
    """Golden: the reference 4D eval protocol — rollout steps {0,1,3,5}
    scored against GT at +{0,2,4,6} frames — through our metric equals a
    direct transcription of the reference's Metric_mIoU_Temporal math
    (`occ_metrics.py:460-543`, `apis/test.py:218-223`,
    `preworld_temporal_traj.py:297`)."""

    def test_reference_protocol_golden(self):
        rng = np.random.default_rng(3)
        shape, n_cls = (8, 8, 4), 18
        # model rollout outputs: step k == semantic_occ_{k}s in our naming
        steps = {k: rng.integers(0, n_cls, shape) for k in range(7)}
        gts = {f: rng.integers(0, n_cls, shape) for f in (0, 2, 4, 6)}

        # reference transcription: step k is keyed {k+1}s at inference, the
        # runner stacks keys {0,2,4,6}s -> rollout steps {0,1,3,5}; GT frame
        # offset idx scores stack position idx//2 with hist_info/per_class_iu
        stacked = [steps[0], steps[1], steps[3], steps[5]]
        ref = {}
        for f in (0, 2, 4, 6):
            gt, pred = gts[f].flatten(), stacked[f // 2].flatten()
            k = (gt >= 0) & (gt < n_cls)
            h = np.bincount(
                n_cls * gt[k].astype(int) + pred[k].astype(int),
                minlength=n_cls**2,
            ).reshape(n_cls, n_cls)
            iou = np.diag(h) / (h.sum(1) + h.sum(0) - np.diag(h))
            ref[f // 2] = round(float(np.nanmean(iou[: n_cls - 1])) * 100, 2)

        # repo path (tools/test_temporal.py --protocol reference)
        m = MetricMIoUTemporal(num_classes=n_cls)
        m.add_batch(
            {h: steps[s] for h, s in zip((0, 1, 2, 3), (0, 1, 3, 5))},
            {h: gts[f] for h, f in zip((0, 1, 2, 3), (0, 2, 4, 6))},
        )
        res = m.count_miou()
        for h in (0, 1, 2, 3):
            assert res[f"mIoU_{h}s"] == ref[h]
        assert res["mIoU_avg_1_3s"] == round(
            float(np.mean([ref[1], ref[2], ref[3]])), 2
        )


class TestConfig:
    def test_base_inheritance_and_merge(self):
        cfg = Config.fromfile(
            os.path.join(CFG_DIR, "preworld_7frame_pretrain.py")
        )
        # base value survives
        assert cfg["grid_config"]["x"] == [-40.0, 40.0, 0.4]
        # derived override wins
        assert cfg["model"]["if_pretrain"] is True
        assert cfg["runner"]["max_epochs"] == 6
        # deep merge keeps base model keys
        assert cfg["model"]["num_trans_channels"] == 32

    def test_cfg_options_override(self):
        cfg = Config.fromfile(
            os.path.join(CFG_DIR, "preworld_7frame_finetune.py")
        )
        cfg.merge_from_options(["model.out_dim=64", "runner.max_epochs=2"])
        assert cfg["model"]["out_dim"] == 64
        assert cfg["runner"]["max_epochs"] == 2

    def test_build_model_from_config(self):
        from preworld_tpu.train.builder import build_model

        cfg = Config.fromfile(
            os.path.join(CFG_DIR, "preworld_7frame_pretrain.py")
        )
        model = build_model(cfg)
        assert model.cfg.if_pretrain is True
        assert model.cfg.grid.num_depth_bins == 88
        assert model.cfg.nerf.spec.num_inner == 391


class TestAllConfigsBuild:
    def test_every_shipped_config_builds(self):
        """Every config under configs/preworld builds a model; the builder
        must consume (not silently drop) the keys each config sets."""
        import glob
        import os

        from preworld_tpu.train.builder import build_model

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(glob.glob(os.path.join(repo, "configs/preworld/*.py")))
        assert len(paths) >= 6, paths
        for p in paths:
            cfg = Config.fromfile(p)
            model = build_model(cfg)
            c = model.cfg
            m = cfg["model"]
            assert c.num_classes == int(m.get("num_classes", 18)), p
            # spot-check plumbing for keys configs actually set
            for key, attr in [
                ("depth_loss_weight", "depth_loss_weight"),
                ("balance_cls_weight", "balance_cls_weight"),
            ]:
                if key in m:
                    assert getattr(c, attr) == m[key], (p, key)
            nerf = m.get("nerf_head", {})
            for key in ("fast_color_thres", "max_depth", "variance_focus",
                        "ray_chunk", "bwd_live_cap"):
                if key in nerf:
                    assert getattr(c.nerf, key) == nerf[key], (p, key)
