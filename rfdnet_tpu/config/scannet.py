"""ScanNet/ShapeNet dataset metadata: class codecs, heading/size bins.

Semantic rebuild of `configs/scannet_config.py:11-110` and
`configs/path_config.py:13-36`. The per-class mean sizes are the reference's
`datasets/scannet/scannet_means.npz` (data asset, copied verbatim into
``rfdnet_tpu/assets``).
"""

from __future__ import annotations

import os

import numpy as np

SHAPENETCLASSES = [
    'void',
    'table', 'jar', 'skateboard', 'car', 'bottle',
    'tower', 'chair', 'bookshelf', 'camera', 'airplane',
    'laptop', 'basket', 'sofa', 'knife', 'can',
    'rifle', 'train', 'pillow', 'lamp', 'trash_bin',
    'mailbox', 'watercraft', 'motorbike', 'dishwasher', 'bench',
    'pistol', 'rocket', 'loudspeaker', 'file cabinet', 'bag',
    'cabinet', 'bed', 'birdhouse', 'display', 'piano',
    'earphone', 'telephone', 'stove', 'microphone', 'bus',
    'mug', 'remote', 'bathtub', 'bowl', 'keyboard',
    'guitar', 'washer', 'bicycle', 'faucet', 'printer',
    'cap', 'clock', 'helmet', 'flowerpot', 'microwaves',
]

ScanNet_OBJ_CLASS_IDS = np.array([1, 7, 8, 13, 20, 31, 34, 43])

ShapeNetIDMap = {
    '4379243': 'table', '3593526': 'jar', '4225987': 'skateboard',
    '2958343': 'car', '2876657': 'bottle', '4460130': 'tower',
    '3001627': 'chair', '2871439': 'bookshelf', '2942699': 'camera',
    '2691156': 'airplane', '3642806': 'laptop', '2801938': 'basket',
    '4256520': 'sofa', '3624134': 'knife', '2946921': 'can',
    '4090263': 'rifle', '4468005': 'train', '3938244': 'pillow',
    '3636649': 'lamp', '2747177': 'trash_bin', '3710193': 'mailbox',
    '4530566': 'watercraft', '3790512': 'motorbike', '3207941': 'dishwasher',
    '2828884': 'bench', '3948459': 'pistol', '4099429': 'rocket',
    '3691459': 'loudspeaker', '3337140': 'file cabinet', '2773838': 'bag',
    '2933112': 'cabinet', '2818832': 'bed', '2843684': 'birdhouse',
    '3211117': 'display', '3928116': 'piano', '3261776': 'earphone',
    '4401088': 'telephone', '4330267': 'stove', '3759954': 'microphone',
    '2924116': 'bus', '3797390': 'mug', '4074963': 'remote',
    '2808440': 'bathtub', '2880940': 'bowl', '3085013': 'keyboard',
    '3467517': 'guitar', '4554684': 'washer', '2834778': 'bicycle',
    '3325088': 'faucet', '4004475': 'printer', '2954340': 'cap',
    '3046257': 'clock', '3513137': 'helmet', '3991062': 'flowerpot',
    '3761084': 'microwaves',
}

_ASSETS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


class ScannetConfig:
    def __init__(self, means_path: str | None = None):
        self.num_class = len(ScanNet_OBJ_CLASS_IDS)
        self.num_heading_bin = 12
        self.num_size_cluster = len(ScanNet_OBJ_CLASS_IDS)
        self.type2class = {
            SHAPENETCLASSES[cls]: i for i, cls in enumerate(ScanNet_OBJ_CLASS_IDS)
        }
        self.class2type = {v: k for k, v in self.type2class.items()}
        self.class_ids = ScanNet_OBJ_CLASS_IDS
        self.shapenetid2class = {
            cid: i for i, cid in enumerate(list(self.class_ids))
        }
        if means_path is None:
            means_path = os.path.join(_ASSETS, "scannet_means.npz")
        self.mean_size_arr = np.load(means_path)["arr_0"]
        self.type_mean_size = {
            self.class2type[i]: self.mean_size_arr[i, :]
            for i in range(self.num_size_cluster)
        }

    def angle2class(self, angle):
        """Continuous angle -> (bin class, residual)."""
        num_class = self.num_heading_bin
        angle = angle % (2 * np.pi)
        angle_per_class = 2 * np.pi / float(num_class)
        shifted = (angle + angle_per_class / 2) % (2 * np.pi)
        class_id = np.int16(shifted / angle_per_class)
        residual = shifted - (class_id * angle_per_class + angle_per_class / 2)
        return class_id, residual

    def class2angle(self, pred_cls, residual, to_label_format=True):
        angle_per_class = 2 * np.pi / float(self.num_heading_bin)
        angle = pred_cls * angle_per_class + residual
        if to_label_format and np.ndim(angle) == 0:
            if angle > np.pi:
                angle = angle - 2 * np.pi
        elif to_label_format:
            angle = angle - 2 * np.pi * (np.asarray(angle) > np.pi)
        return angle

    def size2class(self, size, type_name):
        return self.type2class[type_name], size - self.type_mean_size[type_name]

    def class2size(self, pred_cls, residual):
        return self.mean_size_arr[pred_cls, :] + residual

    def param2obb(self, center, heading_class, heading_residual, size_class,
                  size_residual):
        obb = np.zeros((7,))
        obb[0:3] = center
        obb[3:6] = self.class2size(int(size_class), size_residual)
        obb[6] = self.class2angle(heading_class, heading_residual)
        return obb
