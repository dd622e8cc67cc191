"""The .mpf binary format: round-trips mirroring reference
tests/test_io.py:19-123, plus wire-level cross-validation against the
reference's generated protobuf classes (skipped if they can't load)."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

from matrixprofile_ray import io as mio
from matrixprofile_ray.mpf import from_mpf, to_mpf


def _mp_profile(n=256, w=16):
    import matrixprofile_ray.core as core

    rng = np.random.default_rng(0)
    ts = rng.uniform(size=n)
    p = core.stomp(ts, w)
    return {
        "class": "MatrixProfile",
        "algorithm": "stomp",
        "metric": "euclidean",
        "sample_pct": 1.0,
        "w": w,
        "ez": p["ez"],
        "join": False,
        "mp": p["mp"],
        "pi": p["pi"],
        "lmp": p["lmp"],
        "lpi": p["lpi"],
        "rmp": p["rmp"],
        "rpi": p["rpi"],
        "data": {"ts": ts, "query": None},
    }


def _pmp_profile(n=256):
    import matrixprofile_ray.core as core

    rng = np.random.default_rng(1)
    ts = rng.uniform(size=n)
    p = core.skimp(ts, windows=[8, 16, 24])
    return {
        "class": "PMP",
        "algorithm": "skimp",
        "metric": "euclidean",
        "sample_pct": 1.0,
        "windows": np.array([8, 16, 24]),
        "pmp": p["pmp"],
        "pmpi": p["pmpi"].astype(np.int64),
        "data": {"ts": ts, "query": None},
    }


def _assert_round_trip(profile, got):
    for k, v in profile.items():
        if isinstance(v, np.ndarray):
            np.testing.assert_equal(np.asarray(got[k], dtype=v.dtype), v)
        elif k == "data":
            np.testing.assert_equal(got["data"]["ts"], v["ts"])
        else:
            assert got[k] == v, k


class TestMpfRoundTrip:
    def test_mp_round_trip(self):
        profile = _mp_profile()
        got = from_mpf(to_mpf(profile))
        _assert_round_trip(profile, got)

    def test_pmp_round_trip(self):
        profile = _pmp_profile()
        got = from_mpf(to_mpf(profile))
        _assert_round_trip(profile, got)

    def test_motifs_discords_cmp_av(self):
        profile = _mp_profile()
        profile["motifs"] = [
            {"motifs": [3, 17], "neighbors": [40, 40]},
            {"motifs": [5, 99], "neighbors": []},
        ]
        profile["discords"] = np.array([7, 123, 0])
        profile["cmp"] = np.abs(profile["mp"]) * 0.5
        profile["av"] = np.linspace(0, 1, len(profile["mp"]))
        profile["av_type"] = "complexity"
        got = from_mpf(to_mpf(profile))
        np.testing.assert_equal(got["discords"], profile["discords"])
        assert got["motifs"] == profile["motifs"]
        np.testing.assert_equal(got["cmp"], profile["cmp"])
        np.testing.assert_equal(got["av"], profile["av"])
        assert got["av_type"] == "complexity"

    def test_negative_int_matrix_values(self):
        """pi arrays hold -1 sentinels; int64 negatives must survive the
        10-byte varint encoding."""
        profile = _mp_profile()
        profile["pi"] = profile["pi"].copy()
        profile["pi"][:3] = -1
        got = from_mpf(to_mpf(profile))
        np.testing.assert_equal(got["pi"], profile["pi"])

    def test_to_disk_from_disk_mpf(self, tmp_path):
        profile = _mp_profile()
        out = str(tmp_path / "mp.mpf")
        mio.to_disk(profile, out, format="mpf")
        got = mio.from_disk(out)
        _assert_round_trip(profile, got)


REF_PB2 = "/root/reference/matrixprofile/io/protobuf"


@pytest.mark.skipif(
    not os.path.isdir(REF_PB2), reason="reference protobuf not present"
)
class TestWireCompat:
    """Bytes written here parse with the REFERENCE's generated pb2 classes
    and vice versa (pure-python protobuf runtime, isolated subprocess)."""

    def _ref_parse(self, payload: bytes) -> dict:
        code = (
            "import sys, json, base64\n"
            f"sys.path.insert(0, {REF_PB2!r})\n"
            "import proto_messages_pb2 as p\n"
            "o = p.MPFOutput()\n"
            "o.ParseFromString(base64.b64decode(sys.stdin.read()))\n"
            "print(json.dumps({'klass': o.klass, 'algorithm': o.algorithm,\n"
            "  'metric': o.metric, 'sample_pct': o.sample_pct,\n"
            "  'windows': list(o.windows), 'ez': o.mp.ez, 'join': o.mp.join,\n"
            "  'mp': list(o.mp.mp.data), 'pi': list(o.mp.pi.data),\n"
            "  'ts': list(o.ts.data), 'mp_rows': o.mp.mp.rows}))\n"
        )
        import base64

        env = dict(os.environ,
                   PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
        res = subprocess.run(
            [sys.executable, "-c", code],
            input=base64.b64encode(payload).decode(),
            capture_output=True, text=True, env=env, timeout=120,
        )
        if res.returncode != 0:
            pytest.skip(f"reference pb2 unavailable: {res.stderr[-200:]}")
        import json

        return json.loads(res.stdout)

    def _ref_serialize(self) -> bytes | None:
        code = (
            "import sys, base64\n"
            f"sys.path.insert(0, {REF_PB2!r})\n"
            "import proto_messages_pb2 as p\n"
            "o = p.MPFOutput(klass='MatrixProfile', algorithm='mpx',\n"
            "                metric='euclidean', sample_pct=1.0, windows=[4])\n"
            "o.ts.rows = 8; o.ts.data.extend([float(i) for i in range(8)])\n"
            "o.mp.mp.rows = 5; o.mp.mp.data.extend([1.5, 2.0, 0.25, 3.0, 1.0])\n"
            "o.mp.pi.rows = 5; o.mp.pi.data.extend([2, 0, -1, 1, 0])\n"
            "o.mp.ez = 2\n"
            "print(base64.b64encode(o.SerializeToString()).decode())\n"
        )
        env = dict(os.environ,
                   PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, env=env,
                             timeout=120)
        if res.returncode != 0:
            return None
        import base64

        return base64.b64decode(res.stdout.strip())

    def test_engine_bytes_parse_in_reference(self):
        profile = _mp_profile(n=64, w=8)
        parsed = self._ref_parse(to_mpf(profile))
        assert parsed["klass"] == "MatrixProfile"
        assert parsed["algorithm"] == "stomp"
        assert parsed["windows"] == [8]
        assert parsed["ez"] == profile["ez"]
        np.testing.assert_allclose(parsed["mp"], profile["mp"])
        np.testing.assert_array_equal(parsed["pi"], profile["pi"])
        np.testing.assert_allclose(parsed["ts"], profile["data"]["ts"])
        assert parsed["mp_rows"] == len(profile["mp"])

    def test_reference_bytes_parse_in_engine(self):
        payload = self._ref_serialize()
        if payload is None:
            pytest.skip("reference pb2 could not serialize")
        got = from_mpf(payload)
        assert got["class"] == "MatrixProfile"
        assert got["w"] == 4
        assert got["ez"] == 2
        np.testing.assert_allclose(got["mp"], [1.5, 2.0, 0.25, 3.0, 1.0])
        np.testing.assert_array_equal(got["pi"], [2, 0, -1, 1, 0])
        np.testing.assert_allclose(got["data"]["ts"], np.arange(8.0))


class TestMpfProperty:
    def test_random_profiles_round_trip(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=20, deadline=None)
        @given(
            n=st.integers(8, 200),
            seed=st.integers(0, 10**6),
            with_extras=st.booleans(),
        )
        def run(n, seed, with_extras):
            rng = np.random.default_rng(seed)
            mp = rng.uniform(0, 10, size=n)
            pi = rng.integers(-1, n, size=n)
            profile = {
                "class": "MatrixProfile", "algorithm": "mpx",
                "metric": "euclidean", "sample_pct": 1.0, "w": 8,
                "ez": 2, "join": False,
                "mp": mp, "pi": pi,
                "lmp": None, "lpi": None, "rmp": None, "rpi": None,
                "data": {"ts": rng.normal(size=n + 7), "query": None},
            }
            if with_extras:
                profile["discords"] = rng.integers(0, n, size=3)
                profile["av"] = rng.uniform(size=n)
                profile["av_type"] = "custom"
            got = from_mpf(to_mpf(profile))
            np.testing.assert_array_equal(got["mp"], mp)
            np.testing.assert_array_equal(got["pi"], pi)
            assert got["w"] == 8 and got["ez"] == 2
            np.testing.assert_array_equal(
                got["data"]["ts"], profile["data"]["ts"]
            )
            if with_extras:
                np.testing.assert_array_equal(
                    got["discords"], profile["discords"]
                )
                np.testing.assert_array_equal(got["av"], profile["av"])

        run()
