"""Dataset registry (reference datasets/__init__.py:11-17) plus the
procedural `synthetic` scene used for dataset-free testing/benchmarks.
File-based loaders are imported lazily so optional deps (cv2 EXR paths)
don't gate the core framework."""


def _lazy(name):
    def load(*args, **kwargs):
        import importlib
        mod, cls = name.rsplit(".", 1)
        m = importlib.import_module(mod, package=__package__)
        return getattr(m, cls)(*args, **kwargs)
    return load


from .synthetic import SyntheticDataset  # noqa: E402

dataset_dict = {
    "synthetic": SyntheticDataset,
    "nerf": _lazy(".nerf.NeRFDataset"),
    "nsvf": _lazy(".nsvf.NSVFDataset"),
    "colmap": _lazy(".colmap.ColmapDataset"),
    "colmap_exr": _lazy(".colmap_exr.ColmapEXRDataset"),
    "colmap_real_exr": _lazy(".colmap_real_exr.ColmapRealEXRDataset"),
    "myblender": _lazy(".myblender.MyBlenderDataset"),
    "nerfpp": _lazy(".nerfpp.NeRFPPDataset"),
    "rtmv": _lazy(".rtmv.RTMVDataset"),
}
