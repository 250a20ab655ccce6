"""HF hub helper (reference utils/hub.py:6-12): resolve the full repo name
for --push_to_hub. Host-side only; degrades gracefully without the hub lib."""

from __future__ import annotations

from typing import Optional

__all__ = ["get_full_repo_name"]


def get_full_repo_name(
    model_id: str, organization: Optional[str] = None, token: Optional[str] = None
) -> str:
    if organization is not None:
        return f"{organization}/{model_id}"
    try:
        from huggingface_hub import whoami

        username = whoami(token)["name"]
        return f"{username}/{model_id}"
    except Exception:
        return model_id
