"""Fetch the reference's public pretrained checkpoints and record SHA256s.

The reference bootstraps its backbones from two public release files
(Segmentation/deeplabv3+/utils/utils.py:76-88, nets/xception.py:197) and
partial-loads a whole-model checkpoint of the ``deeplab_xception.pth`` key
scheme (train.py:121,317-339):

  mobilenet: .../deeplabv3-plus-pytorch/releases/download/v1.0/mobilenet_v2.pth.tar
  xception:  .../deeplabv3-plus-pytorch/releases/download/v1.0/xception_pytorch_imagenet.pth
  deeplab_xception: .../deeplabv3-plus-pytorch/releases/download/v1.0/deeplab_xception.pth

This script downloads them into ``model_data/`` (override with
``CERVICAL_WEIGHTS_DIR``) and appends SHA256 lines to
``model_data/SHA256SUMS`` so tests/test_real_weights.py can verify
integrity.  The build environment for this repo has zero egress — run this
wherever network access exists and copy ``model_data/`` across; the
real-weight golden tests skip cleanly when files are absent.

Usage: python scripts/fetch_pretrained.py [mobilenet|xception ...]
"""

import hashlib
import os
import sys
import urllib.request

URLS = {
    "mobilenet": ("https://github.com/bubbliiiing/deeplabv3-plus-pytorch/"
                  "releases/download/v1.0/mobilenet_v2.pth.tar"),
    "xception": ("https://github.com/bubbliiiing/deeplabv3-plus-pytorch/"
                 "releases/download/v1.0/xception_pytorch_imagenet.pth"),
    # whole-model VOC-trained checkpoint with the exact key scheme the
    # reference partial-loads (train.py:121 "Bakeboon/deeplab_xception.pth",
    # :317-339); the upstream public artifact of that scheme:
    "deeplab_xception": ("https://github.com/bubbliiiing/"
                         "deeplabv3-plus-pytorch/releases/download/v1.0/"
                         "deeplab_xception.pth"),
}


def weights_dir():
    return os.environ.get("CERVICAL_WEIGHTS_DIR", "model_data")


def sha256(path, chunk=1 << 20):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def main(names):
    d = weights_dir()
    os.makedirs(d, exist_ok=True)
    sums_path = os.path.join(d, "SHA256SUMS")
    for name in names or list(URLS):
        url = URLS[name]
        dest = os.path.join(d, url.rsplit("/", 1)[1])
        if os.path.exists(dest):
            print(f"{dest}: already present")
        else:
            print(f"downloading {url} -> {dest}")
            urllib.request.urlretrieve(url, dest)
        digest = sha256(dest)
        line = f"{digest}  {os.path.basename(dest)}"
        existing = ""
        if os.path.exists(sums_path):
            with open(sums_path) as f:
                existing = f.read()
        if line not in existing:
            with open(sums_path, "a") as f:
                f.write(line + "\n")
        print(line)


if __name__ == "__main__":
    main(sys.argv[1:])
