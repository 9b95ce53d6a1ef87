"""Import helper for the PyTorch reference at /root/reference.

The reference depends on kornia / torchvision / skimage, which are not
installed; the Generator/Discriminator/losses only *import* them, so we install
minimal functional stubs before adding /root/reference to sys.path. This lets
parity tests execute the genuine reference code (UNMODIFIED, read-only) against
this framework's implementations.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as nn

_REFERENCE_PATH = "/root/reference"


def _install_stubs() -> None:
    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")

        def normalize(x, mean, std):
            return (x - mean[None, :, None, None]) / std[None, :, None, None]

        def normalize_min_max(x, min_val=0.0, max_val=1.0):
            flat = x.flatten(1)
            mn = flat.min(dim=1)[0][:, None, None, None]
            mx = flat.max(dim=1)[0][:, None, None, None]
            return (max_val - min_val) * (x - mn) / (mx - mn) + min_val

        kornia.normalize = normalize
        kornia.normalize_min_max = normalize_min_max
        sys.modules["kornia"] = kornia

    if "torchvision" not in sys.modules:
        torchvision = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")

        class _TorchvisionVGG16(nn.Module):
            """Architecture-equivalent skeleton of torchvision.models.vgg16
            (only the attributes the reference VGG16 wrapper touches)."""

            def __init__(self):
                super().__init__()
                plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                        512, 512, 512, "M", 512, 512, 512, "M"]
                layers, in_ch = [], 3
                for v in plan:
                    if v == "M":
                        layers.append(nn.MaxPool2d(2, 2))
                    else:
                        layers += [nn.Conv2d(in_ch, v, 3, padding=1),
                                   nn.ReLU(inplace=True)]
                        in_ch = v
                self.features = nn.Sequential(*layers)
                self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
                self.classifier = nn.Sequential(
                    nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
                    nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
                    nn.Linear(4096, 1000))

        def vgg16(pretrained=False):
            assert not pretrained
            return _TorchvisionVGG16()

        def inception_v3(pretrained=True, transform_input=False):
            """Executing stand-in for torchvision inception_v3 so the
            reference's InceptionNetworkFID (frechet_inception_distance.py:22)
            runs live: the torch_inception mirror exposes Mixed_7c for the
            reference's forward hook and runs the genuine architecture.
            `pretrained` weights do not exist on this host — parity tests
            convert the mirror's (seeded random) weights to both frameworks."""
            assert not transform_input
            from torch_inception import randomized_mirror

            return randomized_mirror(seed=0)

        tv_models.vgg16 = vgg16
        tv_models.inception_v3 = inception_v3
        torchvision.models = tv_models

        # the reference's data.py / model_wrapper.py also touch
        # torchvision.transforms.functional (to_tensor) and torchvision.utils
        # (save_image); minimal functional equivalents so those modules import
        tv_transforms = types.ModuleType("torchvision.transforms")
        tv_functional = types.ModuleType("torchvision.transforms.functional")

        def to_tensor(pic):
            arr = np.asarray(pic, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(np.ascontiguousarray(arr))

        tv_functional.to_tensor = to_tensor
        tv_transforms.functional = tv_functional
        # vgg_16_train.py imports torchvision.datasets at module level (used
        # only inside its main(), which parity tests never call)
        tv_datasets = types.ModuleType("torchvision.datasets")

        def _datasets_unavailable(*a, **k):
            raise NotImplementedError(
                "torchvision.datasets stub: parity tests drive the reference "
                "train()/validate() with pinned batches, not ImageFolder")

        tv_datasets.ImageFolder = _datasets_unavailable

        tv_utils = types.ModuleType("torchvision.utils")

        def save_image(tensor, fp, nrow=8, **kwargs):
            raise NotImplementedError(
                "torchvision.utils.save_image stub: parity tests do not "
                "exercise the reference grid writer")

        tv_utils.save_image = save_image
        torchvision.transforms = tv_transforms
        torchvision.utils = tv_utils
        torchvision.datasets = tv_datasets
        sys.modules["torchvision"] = torchvision
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.transforms"] = tv_transforms
        sys.modules["torchvision.transforms.functional"] = tv_functional
        sys.modules["torchvision.utils"] = tv_utils
        sys.modules["torchvision.datasets"] = tv_datasets

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        draw = types.ModuleType("skimage.draw")

        def random_shapes(shape, min_shapes=1, max_shapes=4, min_size=8,
                          allow_overlap=True):
            img = np.full(shape + (3,), 255, dtype=np.uint8)
            n = np.random.randint(min_shapes, max_shapes + 1)
            for _ in range(n):
                h = np.random.randint(min_size, max(shape[0], min_size + 1))
                w = np.random.randint(min_size, max(shape[1], min_size + 1))
                r = np.random.randint(0, max(shape[0] - h, 0) + 1)
                c = np.random.randint(0, max(shape[1] - w, 0) + 1)
                img[r:r + h, c:c + w] = np.random.randint(0, 255)
            return img, None

        draw.random_shapes = random_shapes
        skimage.draw = draw
        sys.modules["skimage"] = skimage
        sys.modules["skimage.draw"] = draw


def import_reference(module_name: str):
    _install_stubs()
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    return __import__(module_name)


def to_nhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().numpy().transpose(0, 2, 3, 1)


def to_nchw_torch(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
