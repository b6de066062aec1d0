import io
import tarfile

import numpy as np

from attention_models_tpu.data.webdataset import TarImageDataset


def _make_shard(path, n=3):
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(n):
            buf = io.BytesIO()
            Image.fromarray(
                (np.full((40, 40, 3), i * 40)).astype(np.uint8)
            ).save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:05d}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cap = f"caption {i}".encode()
            info = tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(cap)
            tf.addfile(info, io.BytesIO(cap))


def test_tar_dataset_roundtrip(tmp_path):
    shard = str(tmp_path / "shard-000.tar")
    _make_shard(shard)
    ds = TarImageDataset(shard, transform=None, raw=True)
    assert len(ds) == 3
    img, cap = ds[1]
    assert img.shape == (40, 40, 3)
    assert img[0, 0, 0] == 40
    assert cap == "caption 1"


def test_device_prefetch_preserves_order_and_errors():
    from attention_models_tpu.data.loaders import device_prefetch

    items = list(range(10))
    out = list(device_prefetch(iter(items), lambda x: x * 2))
    assert out == [x * 2 for x in items]

    def bad(x):
        if x == 3:
            raise ValueError("boom")
        return x

    import pytest as _pytest
    with _pytest.raises(ValueError, match="boom"):
        list(device_prefetch(iter(items), bad))
