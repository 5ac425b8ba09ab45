"""Load the reference (torch) implementation as a numeric test oracle.

The reference at /root/reference is used ONLY to generate expected outputs in
tests — no code is copied from it. torchvision is absent in this image, so a
minimal stub satisfies the reference's imports (deform_conv2d is never hit on
the paths we test)."""

import sys
import types

_REF = "/root/reference"


def _install_misc_stubs():
    if "notion_client" not in sys.modules:
        nc = types.ModuleType("notion_client")

        class Client:
            def __init__(self, *a, **k):
                pass

        nc.Client = Client
        sys.modules["notion_client"] = nc
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")

        def profile(model, inputs=None, verbose=False):
            return 0.0, 0.0

        thop.profile = profile
        sys.modules["thop"] = thop
    if "numba" not in sys.modules:
        nb = types.ModuleType("numba")

        def _decorator(*a, **k):
            if len(a) == 1 and callable(a[0]) and not k:
                return a[0]

            def wrap(fn):
                return fn

            return wrap

        nb.jit = _decorator
        nb.njit = _decorator
        nb.prange = range
        cuda = types.ModuleType("numba.cuda")
        cuda.jit = _decorator
        cuda.local = types.SimpleNamespace(array=lambda *a, **k: None)
        nb.cuda = cuda
        sys.modules["numba"] = nb
        sys.modules["numba.cuda"] = cuda


def _install_torchvision_stub():
    _install_misc_stubs()
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.18.0"
    ops = types.ModuleType("torchvision.ops")

    def deform_conv2d(*a, **k):
        raise NotImplementedError("torchvision stub")

    def nms(boxes, scores, iou_threshold):
        """Greedy NMS (real implementation — the oracle's NMS paths need it)."""
        import numpy as np
        import torch

        from yolov10_3d_tpu.ops.nms import nms_numpy

        keep = nms_numpy(boxes.cpu().numpy(), scores.cpu().numpy(), iou_threshold)
        return torch.from_numpy(np.asarray(keep)).long()

    ops.deform_conv2d = deform_conv2d
    ops.nms = nms
    transforms = types.ModuleType("torchvision.transforms")
    transforms.__path__ = []  # mark as package
    functional = types.ModuleType("torchvision.transforms.functional")

    class _Passthrough:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    class InterpolationMode:
        NEAREST = "nearest"
        NEAREST_EXACT = "nearest-exact"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    class Resize:
        """Functional nearest/nearest-exact resize over the trailing two dims
        (the FGDM loss path resizes (B, H, W) depth maps; loss.py:1317)."""

        def __init__(self, size, interpolation=InterpolationMode.NEAREST, **k):
            self.size = size
            self.interpolation = interpolation

        def __call__(self, x):
            import torch

            oh, ow = self.size
            ih, iw = x.shape[-2], x.shape[-1]
            if self.interpolation == InterpolationMode.NEAREST_EXACT:
                ys = torch.clamp(((torch.arange(oh) + 0.5) * ih / oh).floor().long(), max=ih - 1)
                xs = torch.clamp(((torch.arange(ow) + 0.5) * iw / ow).floor().long(), max=iw - 1)
            else:  # legacy 'nearest': floor(i * scale)
                ys = torch.clamp((torch.arange(oh) * ih / oh).floor().long(), max=ih - 1)
                xs = torch.clamp((torch.arange(ow) * iw / ow).floor().long(), max=iw - 1)
            return x[..., ys, :][..., xs]

    for name in (
        "Compose", "Normalize", "ToTensor", "CenterCrop",
        "ColorJitter", "RandomResizedCrop", "Pad",
    ):
        setattr(transforms, name, _Passthrough)
    transforms.Resize = Resize
    transforms.InterpolationMode = InterpolationMode
    functional.InterpolationMode = InterpolationMode
    functional.resize = lambda x, *a, **k: x
    datasets = types.ModuleType("torchvision.datasets")

    class ImageFolder:
        def __init__(self, *a, **k):
            raise NotImplementedError("torchvision stub")

    datasets.ImageFolder = ImageFolder
    tv.ops = ops
    tv.transforms = transforms
    tv.datasets = datasets
    transforms.functional = functional
    sys.modules["torchvision.datasets"] = datasets
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def load_reference():
    """Returns the reference ultralytics package (imported from /root/reference)."""
    _install_torchvision_stub()
    # the reference hardcodes .cuda() in compute_heading_loss (loss.py:1132);
    # make .cuda() a no-op on this CPU-only torch build
    import torch

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import ultralytics  # noqa

    return ultralytics


def reference_model(cfg_name: str, nc=None):
    """Build a reference DetectionModel/YOLOv10_3DDetectionModel from YAML.
    ``nc`` overrides the class count (DetectionModel re-parses the YAML with
    the new nc, exactly what the reference trainer does for custom data)."""
    load_reference()
    from ultralytics.nn.tasks import DetectionModel

    cfg = f"{_REF}/ultralytics/cfg/models/v10/{cfg_name}.yaml"
    if "3D" in cfg_name:
        # the reference crashes on its own shipped n/s/b/l/x 3D yamls: parse_model
        # passes kernel_size_1=None which v10Detect3d.__init__ subtracts from
        # (head.py:579); inject the intended default of 3
        import yaml as _yaml

        with open(f"{_REF}/ultralytics/cfg/models/v10-3D/{cfg_name}.yaml") as f:
            d = _yaml.safe_load(f)
        d.setdefault("kernel_size_1", 3)
        d.setdefault("kernel_size_2", 3)
        d["scale"] = cfg_name.split("_")[0][-1]
        d["yaml_file"] = cfg_name
        cfg = d
    model = DetectionModel(cfg, nc=nc, verbose=False)
    model.eval()
    return model


def state_dict_numpy(model):
    """Numpy snapshot of the state dict. ``.numpy()`` on CPU tensors returns
    VIEWS of torch's buffers — in-place optimizer/BN updates would silently
    mutate previously 'captured' weights (burned the round-4 lockstep
    campaign for a day) — so copy."""
    return {k: v.detach().cpu().numpy().copy() for k, v in model.state_dict().items()}
