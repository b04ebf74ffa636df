"""rosbag2 metadata.yaml read/write (reference: crates/apex-io/src/rosbag/
metadata.rs)."""

from __future__ import annotations

import pathlib
from typing import Dict, List, Optional

import yaml


def write_metadata(
    bag_dir: pathlib.Path,
    storage_identifier: str,
    relative_file_paths: List[str],
    topics: List[Dict],
    message_count: int,
    starting_time_ns: int = 0,
    duration_ns: int = 0,
):
    meta = {
        "rosbag2_bagfile_information": {
            "version": 5,
            "storage_identifier": storage_identifier,
            "relative_file_paths": relative_file_paths,
            "duration": {"nanoseconds": duration_ns},
            "starting_time": {"nanoseconds_since_epoch": starting_time_ns},
            "message_count": message_count,
            "topics_with_message_count": [
                {
                    "topic_metadata": {
                        "name": t["name"],
                        "type": t["type"],
                        "serialization_format": "cdr",
                        "offered_qos_profiles": t.get("qos", ""),
                    },
                    "message_count": t.get("message_count", 0),
                }
                for t in topics
            ],
            "compression_format": "",
            "compression_mode": "",
        }
    }
    with open(bag_dir / "metadata.yaml", "w") as f:
        yaml.safe_dump(meta, f, sort_keys=False)


def read_metadata(bag_dir: pathlib.Path) -> Optional[Dict]:
    p = pathlib.Path(bag_dir) / "metadata.yaml"
    if not p.exists():
        return None
    with open(p) as f:
        doc = yaml.safe_load(f)
    return doc.get("rosbag2_bagfile_information") if doc else None
