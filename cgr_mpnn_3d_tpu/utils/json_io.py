"""JSON results persistence (json_dumper.py:5-31 equivalent)."""

from __future__ import annotations

import json
import os

__all__ = ["json_dumper"]


def json_dumper(fpath: str, dictionary: dict, add_training: str | None = None
                ) -> None:
    """Merge-update a JSON results file. With ``add_training`` set to a saved
    model path, the payload is merged under that model's key
    (json_dumper.py:23-28)."""
    try:
        with open(fpath, "r") as f:
            data = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        data = {}

    if add_training:
        dic_name = os.path.basename(add_training).rsplit(".", maxsplit=1)[0]
        data.setdefault(dic_name, {}).update(dictionary)
    else:
        data.update(dictionary)

    with open(fpath, "w") as f:
        json.dump(data, f, indent=4, default=float)
