"""HF hub helpers (reference utils/hub.py:6-12 + train.py:315-321):
resolve the full repo name for --push_to_hub, create the hub repo, and
upload checkpoint artifacts. Host-side only; degrades gracefully (with a
warning, never a crash mid-training) without the hub lib or network."""

from __future__ import annotations

from typing import Optional

__all__ = ["get_full_repo_name", "create_hub_repo", "push_to_hub"]


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


def create_hub_repo(repo_name: str, token: Optional[str] = None) -> bool:
    """Create (or reuse) the hub repo for --push_to_hub, like the
    reference's Repository(clone_from=...) at train.py:318-321. Returns
    True on success, False (with a warning) when the hub is unreachable."""
    try:
        from huggingface_hub import create_repo

        create_repo(repo_name, token=token, exist_ok=True)
        return True
    except Exception as e:  # offline / no hub lib / auth failure
        print(f"WARNING: could not create hub repo {repo_name!r}: {e}")
        return False


def push_to_hub(
    output_dir: str,
    repo_name: str,
    token: Optional[str] = None,
    commit_message: str = "End of training",
) -> bool:
    """Upload the training output directory (checkpoints + sample grids) to
    the hub repo. Returns True on success, False (with a warning) on any
    failure — pushing must never lose a finished training run."""
    try:
        from huggingface_hub import HfApi

        HfApi().upload_folder(
            folder_path=output_dir,
            repo_id=repo_name,
            token=token,
            commit_message=commit_message,
            ignore_patterns=["step_*", "epoch_*", "profile/*", "*.lock"],
        )
        return True
    except Exception as e:
        print(f"WARNING: could not push {output_dir!r} to hub repo "
              f"{repo_name!r}: {e}")
        return False
