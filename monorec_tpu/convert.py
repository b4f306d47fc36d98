"""Convert a reference MonoRec ``.pth`` checkpoint into this framework's
orbax checkpoint layout.

Maps the reference torch ``state_dict`` (module names from
``model/monorec/monorec_model.py``: ``_feature_extractor.encoder.*``,
``att_module.{enc,dec,classifier}.*``, ``depth_module.{enc,dec,predictors}.*``)
onto the flax parameter tree of ``monorec_tpu.models.MonoRec``
(``encoder`` / ``att`` / ``depth_net``), including:

* conv weight layout (O,I,kh,kw) -> (kh,kw,I,O);
* transposed-conv layout (I,O,kh,kw) -> flipped (kh,kw,I,O);
* BatchNorm weight/bias -> scale/bias params, running stats -> batch_stats;
* DataParallel ``module.`` prefix stripping (reference filter_state_dict).

Usage:
    python tools/convert_pth.py monorec_depth_ref.pth out_dir/monorec_depth_ref
    python -m monorec_tpu.convert monorec_depth_ref.pth out_dir/monorec_depth_ref
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

from monorec_tpu.utils.torch_compat import (
    conv_kernel_from_torch,
    conv_transpose_kernel_from_torch,
)


def _strip_data_parallel(sd: Dict) -> Dict:
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module.") :]: v for k, v in sd.items()}
    # Sequential(model, loss) artifacts: "0." prefix; numeric-prefixed dropped.
    out = {}
    for k, v in sd.items():
        if k.startswith("0."):
            k = k[2:]
        if k[0].isdigit():
            continue
        out[k] = v
    return out


def _setdeep(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


class Converter:
    def __init__(self, state_dict: Dict):
        self.sd = {k: np.asarray(v) for k, v in _strip_data_parallel(state_dict).items()}
        self.params: Dict = {}
        self.batch_stats: Dict = {}
        self.used = set()

    def _get(self, key: str):
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    # ---- primitive layer mappers --------------------------------------

    def conv(self, torch_prefix: str, flax_path: Tuple[str, ...], bias: bool = True):
        _setdeep(
            self.params, flax_path + ("kernel",),
            conv_kernel_from_torch(self._get(f"{torch_prefix}.weight")),
        )
        if bias and self.has(f"{torch_prefix}.bias"):
            _setdeep(self.params, flax_path + ("bias",), self._get(f"{torch_prefix}.bias"))

    def conv_t(self, torch_prefix: str, flax_path: Tuple[str, ...]):
        _setdeep(
            self.params, flax_path + ("kernel",),
            conv_transpose_kernel_from_torch(self._get(f"{torch_prefix}.weight")),
        )
        _setdeep(self.params, flax_path + ("bias",), self._get(f"{torch_prefix}.bias"))

    def bn(self, torch_prefix: str, flax_path: Tuple[str, ...]):
        _setdeep(self.params, flax_path + ("scale",), self._get(f"{torch_prefix}.weight"))
        _setdeep(self.params, flax_path + ("bias",), self._get(f"{torch_prefix}.bias"))
        _setdeep(
            self.batch_stats, flax_path + ("mean",), self._get(f"{torch_prefix}.running_mean")
        )
        _setdeep(
            self.batch_stats, flax_path + ("var",), self._get(f"{torch_prefix}.running_var")
        )

    # ---- module mappers -------------------------------------------------

    def same_conv(self, torch_prefix: str, flax_module: Tuple[str, ...], idx: int = 0):
        """reference ConvReLU / Upconv conv -> SamePadConv_{idx}/Conv_0."""
        self.conv(torch_prefix, flax_module + (f"SamePadConv_{idx}", "Conv_0"))

    def sep_conv(self, torch_prefix: str, flax_module: Tuple[str, ...]):
        """reference ConvReLU2 (conv_y then conv_x) -> SamePadConv_0/1."""
        self.conv(f"{torch_prefix}.conv_y", flax_module + ("SamePadConv_0", "Conv_0"))
        self.conv(f"{torch_prefix}.conv_x", flax_module + ("SamePadConv_1", "Conv_0"))

    # ---- whole networks ---------------------------------------------------

    def convert_resnet(self, tp: str = "_feature_extractor.encoder", fp: str = "encoder"):
        if f"{tp}.conv1.weight" not in self.sd:
            return
        if f"{tp}.layer1.0.conv3.weight" in self.sd:
            # Bottleneck nets (ResNet-50/101/152) have a third conv per
            # block; converting only conv1/conv2 would silently drop
            # weights — refuse instead of producing a broken subtree.
            import logging

            logging.getLogger(__name__).warning(
                "convert_resnet: bottleneck ResNet (conv3 present) is not "
                "supported by the converter; skipping encoder conversion"
            )
            return
        self.conv(f"{tp}.conv1", (fp, "Conv_0"), bias=False)
        self.bn(f"{tp}.bn1", (fp, "_BN_0", "BatchNorm_0"))
        # Block counts detected from the state_dict itself so ResNet-18
        # (2,2,2,2) and ResNet-34 (3,4,6,3) both convert completely.
        counts = {}
        for layer in ("layer1", "layer2", "layer3", "layer4"):
            b = 0
            while f"{tp}.{layer}.{b}.conv1.weight" in self.sd:
                b += 1
            counts[layer] = b
        for stage_i, (layer, count) in enumerate(counts.items()):
            for b in range(count):
                tb = f"{tp}.{layer}.{b}"
                fb = (fp, f"{layer}_block{b}")
                self.conv(f"{tb}.conv1", fb + ("Conv_0",), bias=False)
                self.bn(f"{tb}.bn1", fb + ("_BN_0", "BatchNorm_0"))
                self.conv(f"{tb}.conv2", fb + ("Conv_1",), bias=False)
                self.bn(f"{tb}.bn2", fb + ("_BN_1", "BatchNorm_0"))
                if self.has(f"{tb}.downsample.0.weight"):
                    self.conv(f"{tb}.downsample.0", fb + ("downsample_conv",), bias=False)
                    self.bn(f"{tb}.downsample.1", fb + ("downsample_bn", "BatchNorm_0"))

    def convert_depth(self, tp: str = "depth_module", fp: str = "depth_net"):
        if f"{tp}.enc.0.0.conv_y.weight" not in self.sd:
            return
        for i in range(5):
            self.sep_conv(f"{tp}.enc.{i}.0", (fp, f"enc{i}a"))
            self.sep_conv(f"{tp}.enc.{i}.1", (fp, f"enc{i}b"))
        # dec0 / dec3 are bare Refine; dec1 / dec2 Sequential(Refine, ConvReLU2)
        self.conv_t(f"{tp}.dec.0.conv2d_t", (fp, "dec0", "ConvTranspose_0"))
        self.conv_t(f"{tp}.dec.1.0.conv2d_t", (fp, "dec1", "ConvTranspose_0"))
        self.sep_conv(f"{tp}.dec.1.1", (fp, "dec1b"))
        self.conv_t(f"{tp}.dec.2.0.conv2d_t", (fp, "dec2", "ConvTranspose_0"))
        self.sep_conv(f"{tp}.dec.2.1", (fp, "dec2b"))
        self.conv_t(f"{tp}.dec.3.conv2d_t", (fp, "dec3", "ConvTranspose_0"))
        self.sep_conv(f"{tp}.dec.4.0", (fp, "dec4a"))
        self.conv(f"{tp}.dec.4.2", (fp, "dec4b", "Conv_0"))
        for i in range(4):
            self.conv(f"{tp}.predictors.{i}.1", (fp, f"pred{i}", "SamePadConv_0", "Conv_0"))

    def convert_mask(self, tp: str = "att_module", fp: str = "att"):
        if f"{tp}.enc.0.0.conv.weight" not in self.sd:
            return
        # encoder: stage 0 has no MaxPool, so ConvReLUs sit at indices 0/1;
        # stages 1-4 have MaxPool at 0, ConvReLUs at 1/2.
        for i in range(5):
            a, b = (0, 1) if i == 0 else (1, 2)
            self.same_conv(f"{tp}.enc.{i}.{a}.conv", (fp, "cv_encoder", f"enc{i}a"))
            self.same_conv(f"{tp}.enc.{i}.{b}.conv", (fp, "cv_encoder", f"enc{i}b"))
        # decoder: Sequential(Upconv, ConvReLU, ConvReLU)
        for i in range(4):
            self.same_conv(f"{tp}.dec.{i}.0.conv", (fp, "decoder", f"up{i}"))
            self.same_conv(f"{tp}.dec.{i}.1.conv", (fp, "decoder", f"dec{i}a"))
            self.same_conv(f"{tp}.dec.{i}.2.conv", (fp, "decoder", f"dec{i}b"))
        self.conv(f"{tp}.classifier.0", (fp, "decoder", "classifier"))

    def convert(self) -> Tuple[Dict, Dict]:
        self.convert_resnet()
        self.convert_depth()
        self.convert_mask()
        return self.params, self.batch_stats

    def unused_keys(self):
        ignorable = ("num_batches_tracked", "sad_kernel", "ssim")
        return [
            k for k in self.sd
            if k not in self.used and not any(s in k for s in ignorable)
        ]


def convert_state_dict(state_dict: Dict) -> Tuple[Dict, Dict, list]:
    c = Converter(state_dict)
    params, batch_stats = c.convert()
    return params, batch_stats, c.unused_keys()


def main():
    import torch

    import orbax.checkpoint as ocp

    src, dst = sys.argv[1], sys.argv[2]
    ckpt = torch.load(src, map_location="cpu")
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd = {k: v.numpy() for k, v in sd.items()}
    params, batch_stats, unused = convert_state_dict(sd)
    if unused:
        print(f"warning: {len(unused)} unmapped keys, e.g. {unused[:5]}")
    payload = {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": {},
        "meta": {"epoch": int(ckpt.get("epoch", 0)), "monitor_best": 0.0},
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(Path(dst).resolve(), payload)
    print(f"converted {src} -> {dst}")


if __name__ == "__main__":
    main()
