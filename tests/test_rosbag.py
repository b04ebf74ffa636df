"""ROS2 bag I/O tests: CDR round-trips, sqlite3 + MCAP storage round-trips,
metadata.yaml — mirroring the reference rosbag_integration_tests.rs."""

import numpy as np
import pytest

from apex_tpu.io.rosbag import (
    McapStorageReader,
    Reader,
    REGISTRY,
    Writer,
    deserialize,
    read_metadata,
    serialize,
)


def odom_msg(x, y, yaw, t_sec):
    import math

    return {
        "header": {"stamp": {"sec": t_sec, "nanosec": 500}, "frame_id": "odom"},
        "child_frame_id": "base_link",
        "pose": {
            "pose": {
                "position": {"x": x, "y": y, "z": 0.0},
                "orientation": {
                    "x": 0.0, "y": 0.0,
                    "z": math.sin(yaw / 2), "w": math.cos(yaw / 2),
                },
            },
            "covariance": [0.01] * 36,
        },
        "twist": {
            "twist": {
                "linear": {"x": 1.0, "y": 0.0, "z": 0.0},
                "angular": {"x": 0.0, "y": 0.0, "z": 0.1},
            },
            "covariance": [0.0] * 36,
        },
    }


@pytest.mark.parametrize(
    "type_name,msg",
    [
        ("std_msgs/msg/String", {"data": "hello apex"}),
        ("std_msgs/msg/Float64", {"data": 3.14159}),
        ("geometry_msgs/msg/Point", {"x": 1.0, "y": -2.0, "z": 3.5}),
        (
            "geometry_msgs/msg/PoseStamped",
            {
                "header": {"stamp": {"sec": 7, "nanosec": 13}, "frame_id": "map"},
                "pose": {
                    "position": {"x": 1.0, "y": 2.0, "z": 3.0},
                    "orientation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
                },
            },
        ),
        ("nav_msgs/msg/Odometry", odom_msg(1.0, 2.0, 0.3, 5)),
        (
            "sensor_msgs/msg/Imu",
            {
                "header": {"stamp": {"sec": 1, "nanosec": 2}, "frame_id": "imu"},
                "orientation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
                "orientation_covariance": list(np.eye(3).ravel()),
                "angular_velocity": {"x": 0.1, "y": 0.2, "z": 0.3},
                "angular_velocity_covariance": [0.0] * 9,
                "linear_acceleration": {"x": 0.0, "y": 0.0, "z": 9.81},
                "linear_acceleration_covariance": [0.0] * 9,
            },
        ),
        (
            "tf2_msgs/msg/TFMessage",
            {
                "transforms": [
                    {
                        "header": {"stamp": {"sec": 0, "nanosec": 0}, "frame_id": "map"},
                        "child_frame_id": "odom",
                        "transform": {
                            "translation": {"x": 0.5, "y": 0.0, "z": 0.0},
                            "rotation": {"x": 0.0, "y": 0.0, "z": 0.0, "w": 1.0},
                        },
                    }
                ]
            },
        ),
        (
            "sensor_msgs/msg/JointState",
            {
                "header": {"stamp": {"sec": 3, "nanosec": 4}, "frame_id": ""},
                "name": ["j1", "j2"],
                "position": [0.1, 0.2],
                "velocity": [],
                "effort": [],
            },
        ),
    ],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_cdr_roundtrip(type_name, msg):
    raw = serialize(type_name, msg)
    out = deserialize(type_name, raw)

    def compare(a, b, where=""):
        if isinstance(a, dict):
            for k in a:
                compare(a[k], b[k], where + "." + k)
        elif isinstance(a, list):
            assert len(a) == len(b), where
            for i, (x, y) in enumerate(zip(a, b)):
                compare(x, y, f"{where}[{i}]")
        elif isinstance(a, float):
            np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=where)
        else:
            assert a == b, where

    compare(msg, out)


def test_cdr_alignment():
    """uint8 followed by float64 requires 7 pad bytes; verify via a custom
    schema."""
    from apex_tpu.io.rosbag.cdr import CdrReader, CdrWriter, decode, encode

    reg = {"Test": [("a", "uint8"), ("b", "float64"), ("c", "int16")]}
    w = CdrWriter()
    encode("Test", reg, {"a": 7, "b": 2.5, "c": -3}, w)
    raw = w.getvalue()
    assert len(raw) == 4 + 8 + 8 + 2  # header + aligned u8 + f64 + i16
    out = decode("Test", reg, CdrReader(raw))
    assert out == {"a": 7, "b": 2.5, "c": -3}


@pytest.mark.parametrize("storage", ["sqlite3", "mcap"])
def test_bag_roundtrip(tmp_path, storage):
    bag = tmp_path / f"test_bag_{storage}"
    with Writer(bag, storage=storage) as w:
        w.add_topic("/odom", "nav_msgs/msg/Odometry")
        w.add_topic("/chatter", "std_msgs/msg/String")
        for i in range(10):
            w.write("/odom", 1_000_000_000 * i, odom_msg(float(i), 0.0, 0.1 * i, i))
        w.write("/chatter", 500, {"data": "static"})

    meta = read_metadata(bag)
    assert meta["storage_identifier"] == storage
    assert meta["message_count"] == 11

    with Reader(bag) as r:
        topics = {t[1]: t[2] for t in r.topics()}
        assert topics["/odom"] == "nav_msgs/msg/Odometry"
        assert r.message_count() == 11
        msgs = list(r.messages(topics=["/odom"]))
        assert len(msgs) == 10
        topic, tname, ts, msg = msgs[3]
        assert topic == "/odom" and ts == 3_000_000_000
        np.testing.assert_allclose(msg["pose"]["pose"]["position"]["x"], 3.0)
        # time-ordered
        assert [m[2] for m in msgs] == sorted(m[2] for m in msgs)


@pytest.mark.parametrize("storage", ["sqlite3", "mcap"])
def test_bag_read_raw_unknown_type(tmp_path, storage):
    bag = tmp_path / f"raw_bag_{storage}"
    with Writer(bag, storage=storage) as w:
        w.add_topic("/custom", "my_msgs/msg/Unknown")
        w.write("/custom", 42, b"\x00\x01\x00\x00rawbytes")
    with Reader(bag) as r:
        msgs = list(r.messages())
        assert msgs[0][3] == b"\x00\x01\x00\x00rawbytes"  # undecoded passthrough


def test_mcap_structure(tmp_path):
    """The written MCAP has valid magic/footer and parses standalone."""
    bag = tmp_path / "m"
    with Writer(bag, storage="mcap") as w:
        w.add_topic("/p", "geometry_msgs/msg/Point")
        w.write("/p", 1, {"x": 1.0, "y": 2.0, "z": 3.0})
    f = next(bag.glob("*.mcap"))
    data = f.read_bytes()
    assert data[:8] == data[-8:] == b"\x89MCAP0\r\n"
    r = McapStorageReader(f)
    assert r.message_count() == 1
    (topic, tname, ts, raw), = list(r.messages())
    assert deserialize(tname, raw)["y"] == 2.0


def test_writer_unknown_topic_raises(tmp_path):
    with Writer(tmp_path / "b", storage="sqlite3") as w:
        with pytest.raises(KeyError):
            w.write("/nope", 0, b"x")
        w.add_topic("/ok", "std_msgs/msg/Bool")
        w.write("/ok", 0, {"data": True})


def test_registry_coverage():
    """Every message type in the reference's 94-topic fixture bag is
    registered (crates/apex-io/tests/test_bags/, rosbag/mod.rs:14)."""
    needed = [
        "nav_msgs/msg/Odometry", "nav_msgs/msg/Path", "nav_msgs/msg/GridCells",
        "geometry_msgs/msg/PoseStamped", "geometry_msgs/msg/TransformStamped",
        "geometry_msgs/msg/AccelWithCovarianceStamped",
        "geometry_msgs/msg/PolygonStamped", "geometry_msgs/msg/InertiaStamped",
        "sensor_msgs/msg/Imu", "sensor_msgs/msg/PointCloud2",
        "sensor_msgs/msg/PointCloud", "sensor_msgs/msg/MultiEchoLaserScan",
        "sensor_msgs/msg/MultiDOFJointState", "sensor_msgs/msg/Joy",
        "sensor_msgs/msg/LaserScan", "sensor_msgs/msg/CameraInfo",
        "stereo_msgs/msg/DisparityImage",
        "tf2_msgs/msg/TFMessage", "tf2_msgs/msg/TF2Error",
        "std_msgs/msg/Empty", "std_msgs/msg/UInt64MultiArray",
    ]
    for t in needed:
        assert t in REGISTRY
    assert len(REGISTRY) >= 94


def test_registry_all_types_roundtrip_zero_filled():
    """Every registered schema serializes a zero-filled message and decodes
    it back (catches schema typos across the whole registry)."""
    for t in sorted(REGISTRY):
        raw = serialize(t, {})
        out = deserialize(t, raw)
        assert isinstance(out, dict)


@pytest.mark.parametrize("compression", ["zstd", "zlib"])
def test_mcap_compressed_roundtrip(tmp_path, compression):
    """Compressed-chunk MCAP write/read (reference zstd chunk writing,
    rosbag/types.rs:176-190)."""
    bag = tmp_path / f"c_{compression}"
    with Writer(bag, storage="mcap", compression=compression) as w:
        w.add_topic("/odom", "nav_msgs/msg/Odometry")
        for i in range(25):
            w.write("/odom", 10_000 * i, odom_msg(float(i), 1.0, 0.0, i))
    f = next(bag.glob("*.mcap"))
    # the chunk payload is actually compressed: codec name on disk,
    # and the repeated covariance arrays shrink the data section
    assert compression.encode() in f.read_bytes()
    with Reader(bag) as r:
        msgs = list(r.messages(topics=["/odom"]))
        assert len(msgs) == 25
        assert msgs[7][3]["pose"]["pose"]["position"]["x"] == 7.0


def test_mcap_multi_chunk_flush(tmp_path):
    """Chunks flush at the size threshold and all land in the reader."""
    from apex_tpu.io.rosbag import McapStorageReader, McapStorageWriter

    f = tmp_path / "multi.mcap"
    w = McapStorageWriter(f, compression="zstd", chunk_size=256)
    w.add_topic("/s", "std_msgs/msg/String")
    for i in range(50):
        w.write("/s", i, serialize("std_msgs/msg/String", {"data": f"msg {i:04d}" * 4}))
    w.close()
    r = McapStorageReader(f)
    msgs = list(r.messages())
    assert len(msgs) == 50
    assert [m[2] for m in msgs] == list(range(50))
    # more than one Chunk record was written
    assert f.read_bytes().count(b"zstd") > 1


def test_sqlite_compression_rejected(tmp_path):
    with pytest.raises(ValueError, match="mcap"):
        Writer(tmp_path / "x", storage="sqlite3", compression="zstd")
