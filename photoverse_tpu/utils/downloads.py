"""Host-side weight/dataset fetch utilities.

Capability parity with /root/reference/utils/arcface_utils.py:11-33,159-177
(GDrive/HF-hub downloads of the ArcFace resnet18 weights, the Arc2Face
arcface.onnx and antelopev2 detector zips) — kept out of the compute path
and tolerant of offline environments (every function returns the target
path if the file already exists and raises a clear error otherwise when the
fetch backend is unavailable).
"""

from __future__ import annotations

import os
import zipfile
from typing import Optional

__all__ = [
    "download_gdrive_file",
    "download_arcface_pytorch",
    "setup_arcface_model",
    "download_hf_file",
]

# the reference's published weight file (arcface_utils.py:159)
ARCFACE_RESNET18_GDRIVE_ID = "1Oled0dzlDhtuTc0kShExuvAaB0grmIA_"


def download_gdrive_file(file_id: str, dest_path: str, quiet: bool = False) -> str:
    if os.path.exists(dest_path):
        return dest_path
    try:
        import gdown
    except ImportError as e:
        raise RuntimeError(
            f"gdown unavailable and {dest_path} missing — download "
            f"https://drive.google.com/uc?id={file_id} manually"
        ) from e
    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    gdown.download(f"https://drive.google.com/uc?id={file_id}", dest_path, quiet=quiet)
    return dest_path


def download_arcface_pytorch(
    model_dir: str, file_id: str = ARCFACE_RESNET18_GDRIVE_ID
) -> str:
    """The arcface_resnet18.pth weights used by the identity loss
    (reference utils/arcface_utils.py:159-177); convert with
    photoverse_tpu.models.arcface.convert_arcface after loading."""
    return download_gdrive_file(
        file_id, os.path.join(model_dir, "arcface_resnet18.pth")
    )


def download_hf_file(repo_id: str, filename: str, dest_dir: str) -> str:
    dest = os.path.join(dest_dir, os.path.basename(filename))
    if os.path.exists(dest):
        return dest
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise RuntimeError(
            f"huggingface_hub unavailable and {dest} missing"
        ) from e
    return hf_hub_download(repo_id=repo_id, filename=filename, local_dir=dest_dir)


def setup_arcface_model(
    models_dir: str,
    arcface_repo: str = "FoivosPar/Arc2Face",
    antelope_zip_id: Optional[str] = None,
) -> str:
    """Fetch the Arc2Face arcface.onnx + antelopev2 detection models
    (reference utils/arcface_utils.py:11-33). The onnx path is vestigial in
    the reference (no main-path consumer) and kept only for checkpoint
    compatibility tooling."""
    os.makedirs(models_dir, exist_ok=True)
    onnx_path = download_hf_file(arcface_repo, "arcface.onnx", models_dir)
    if antelope_zip_id:
        z = download_gdrive_file(
            antelope_zip_id, os.path.join(models_dir, "antelopev2.zip")
        )
        with zipfile.ZipFile(z) as zf:
            zf.extractall(models_dir)
    return onnx_path
