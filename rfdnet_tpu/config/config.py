"""Config system: YAML files with the reference schema drop in unchanged.

Semantic rebuild of `configs/config_utils.py:11-149` (CONFIG: nested-dict
YAML + recursive override, timestamped run dir, logger, out_config dump)
plus the model factory that the reference spreads across
`net_utils/utils.py:226-277` and `models/iscnet/config.py`.
"""

from __future__ import annotations

import datetime
import logging
import os
from typing import Any

import yaml

from .scannet import ScannetConfig


def update_recursive(dict1: dict, dict2: dict) -> None:
    """In-place recursive override (`config_utils.py:11-25`)."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {}
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


_DEFAULTS: dict[str, Any] = {
    "method": "ISCNet",
    "resume": False,
    "finetune": False,
    "weight": [],
    "seed": 10,
    "device": {"num_workers": 0},
    "data": {
        "dataset": "scannet",
        "split": "datasets/splits/fullscan",
        "shapenet_path": "datasets/ShapeNetv2_data",
        "num_point": 80000,
        "num_target": 256,
        "vote_factor": 1,
        "cluster_sampling": "vote_fps",
        "ap_iou_thresh": 0.25,
        "no_height": False,
        "use_color_detection": False,
        "use_color_completion": False,
        "points_unpackbits": True,
        "points_subsample": [1024, 1024],
        "hidden_dim": 512,
        "c_dim": 512,
        "z_dim": 32,
        "threshold": 0.5,
        "completion_limit_in_train": 10,
        "use_cls_for_completion": False,
        "skip_propagate": True,
        "decoder_bf16": False,
        # bf16 operand/activation chains in the backbone/voting/agg/
        # skip-prop shared MLPs (f32 accumulate + BN stats + geometry
        # heads) — train-throughput mode; f32 default for parity
        "mlp_bf16": False,
    },
    "model": {},
    "optimizer": {
        "method": "Adam", "lr": 1e-3, "betas": [0.9, 0.999],
        "eps": 1e-8, "weight_decay": 0,
    },
    "scheduler": {"patience": 20, "factor": 0.1, "threshold": 0.01},
    "bnscheduler": {
        "bn_decay_step": 20, "bn_decay_rate": 0.5,
        "bn_momentum_init": 0.5, "bn_momentum_max": 0.001,
    },
    "train": {"epochs": 240, "phase": "detection", "freeze": [], "batch_size": 8},
    "val": {"phase": "detection", "batch_size": 8},
    "test": {"phase": "completion", "batch_size": 1},
    "demo": {"phase": "completion"},
    "generation": {
        "generate_mesh": True, "resolution_0": 32, "upsampling_steps": 0,
        "use_sampling": False, "refinement_step": 0, "simplify_nfaces": None,
        "dump_threshold": 0.5, "dump_results": False,
        # occupancy-decode implementation: None picks by numerics config
        # (fused bf16 Pallas kernel only when data.decoder_bf16 opted in);
        # "pallas" | "flax" force it (serving mode / f32-parity mode)
        "decoder_impl": None,
    },
    "log": {"vis_path": "visualization", "save_results": True,
            "vis_step": 100, "print_step": 10, "path": "out/iscnet"},
    "mode": "train",
}

_EVAL_DEFAULTS = {
    "remove_empty_box": False,
    "use_3d_nms": True,
    "nms_iou": 0.25,
    "use_old_type_nms": False,
    "cls_nms": True,
    "per_class_proposal": True,
    "conf_thresh": 0.05,
}


class Config:
    """Loaded experiment configuration + dataset metadata + run logging."""

    def __init__(self, config: str | dict | None = None, mode: str = "train",
                 make_dirs: bool = True):
        import copy

        self.config: dict = copy.deepcopy(_DEFAULTS)
        if isinstance(config, str):
            with open(config) as f:
                loaded = yaml.safe_load(f)
            update_recursive(self.config, loaded)
        elif isinstance(config, dict):
            update_recursive(self.config, config)
        self.config["mode"] = mode

        self.dataset_config = ScannetConfig()
        self.eval_config = dict(_EVAL_DEFAULTS)
        mode_cfg = self.config.get(mode, {})
        for src, dst in [
            ("use_3d_nms", "use_3d_nms"), ("nms_iou", "nms_iou"),
            ("use_old_type_nms", "use_old_type_nms"),
            ("use_cls_nms", "cls_nms"),
            ("per_class_proposal", "per_class_proposal"),
            ("conf_thresh", "conf_thresh"),
        ]:
            if src in mode_cfg:
                self.eval_config[dst] = mode_cfg[src]
        if "faster_eval" in mode_cfg:
            # `config_utils.py:139`: remove_empty_box = not faster_eval
            self.eval_config["remove_empty_box"] = not mode_cfg["faster_eval"]
        self.eval_config["dataset_config"] = self.dataset_config

        self.save_path = None
        self._logger = logging.getLogger("rfdnet_tpu")
        if make_dirs and mode == "train":
            stamp = datetime.datetime.now().isoformat()
            self.save_path = os.path.join(self.config["log"]["path"], stamp)
            os.makedirs(self.save_path, exist_ok=True)
            handler = logging.FileHandler(os.path.join(self.save_path, "log.txt"))
            handler.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
            self._logger.addHandler(handler)
            self._logger.setLevel(logging.INFO)
            with open(os.path.join(self.save_path, "out_config.yaml"), "w") as f:
                yaml.safe_dump(self.config, f)

    def log_string(self, msg):
        self._logger.info(msg)
        print(msg)

    # ----------------------------------------------------------- factory
    @property
    def phase(self) -> str:
        return self.config[self.config["mode"]]["phase"]

    def build_model(self, bn_axis_name: str | None = None, fps_impl=None,
                    generate_limit: int = 64):
        from ..models import ISCNet

        d = self.config["data"]
        return ISCNet(
            num_class=self.dataset_config.num_class,
            num_heading_bin=self.dataset_config.num_heading_bin,
            num_size_cluster=self.dataset_config.num_size_cluster,
            mean_size_arr=self.dataset_config.mean_size_arr,
            num_proposal=d["num_target"],
            vote_factor=d["vote_factor"],
            cluster_sampling=d["cluster_sampling"],
            input_feature_dim=int(d["use_color_detection"]) * 3
            + int(not d["no_height"]),
            completion_feature_dim=int(d["use_color_completion"]) * 3
            + int(not d["no_height"]),
            phase=self.phase,
            skip_propagate=d["skip_propagate"],
            c_dim=d["c_dim"],
            hidden_dim=d["hidden_dim"],
            z_dim=d["z_dim"],
            threshold=d["threshold"],
            use_cls_for_completion=d["use_cls_for_completion"],
            completion_limit=d["completion_limit_in_train"],
            generate_limit=generate_limit,
            decoder_dtype="bfloat16" if d.get("decoder_bf16") else None,
            mlp_dtype="bfloat16" if d.get("mlp_bf16") else None,
            bn_axis_name=bn_axis_name,
            fps_impl=fps_impl,
        )

    def bn_momentum(self, epoch: int) -> float:
        """`load_bnm_scheduler` lambda (`models/optimizers.py:56-60`):
        max(init * rate^(epoch // step), momentum_max)."""
        bs = self.config["bnscheduler"]
        return max(
            bs["bn_momentum_init"]
            * bs["bn_decay_rate"] ** int(epoch / bs["bn_decay_step"]),
            bs["bn_momentum_max"],
        )
