"""HTTP serving tests: drive the real server over a socket."""

import io
import json
import threading
import urllib.error
import urllib.request
import zipfile

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from umx_tpu.config import ModelConfig
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts
    from umx_tpu.serve import serve

    tmp = tmp_path_factory.mktemp("serve")
    model_path = str(tmp / "model.bin.gz")
    write_ggml(model_path, 64, synthetic_state_dicts(ModelConfig(hidden_size=64), 0))

    srv = serve(model_path, port=0, segment_secs=1.0)  # port 0 = ephemeral
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    status, body = _get(server + "/healthz")
    assert status == 200 and body["status"] == "ok"


def test_info(server):
    status, body = _get(server + "/info")
    assert status == 200
    assert body["hidden_size"] == 64
    assert body["targets"] == ["bass", "drums", "other", "vocals"]


def test_info_autoscaling_signals(server):
    _, body = _get(server + "/info")
    auto = body["autoscaling"]
    assert set(auto) == {
        "busy_fraction", "queue_depth", "avg_batch_fill", "batch_headroom", "scale_hint"
    }
    assert 0.0 <= auto["busy_fraction"] <= 1.0
    assert auto["queue_depth"] >= 0
    assert auto["scale_hint"] in ("up", "steady", "down")
    # an idle server with no sessions must never claim it needs scale-up
    if auto["queue_depth"] == 0 and body["streaming_sessions"] == 0:
        assert auto["scale_hint"] in ("steady", "down")


def test_stats_reset(server):
    req = urllib.request.Request(server + "/stats/reset", method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.status == 200 and json.loads(r.read())["status"] == "reset"
    _, body = _get(server + "/info")
    b = body["batching"]
    assert b["jobs"] == 0 and b["device_calls"] == 0 and b["busy_s"] == 0.0


def test_demix_round_trip(server):
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    wav_buf = io.BytesIO()
    audio = rng.uniform(-0.5, 0.5, (44100, 2)).astype(np.float32)
    wavfile.write(wav_buf, 44100, audio)

    req = urllib.request.Request(
        server + "/demix?shifts=0&wiener=1", data=wav_buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/zip"
        payload = r.read()

    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = sorted(zf.namelist())
        assert names == [f"target_{i}.wav" for i in range(4)]
        total = 0
        for name in names:
            rate, data = wavfile.read(io.BytesIO(zf.read(name)))
            assert rate == 44100 and data.shape == (44100, 2)
            total = total + data.astype(np.float64)
    # Wiener partition: stems sum back to ~the mix
    corr = np.corrcoef(total.ravel(), audio.astype(np.float64).ravel())[0, 1]
    assert corr > 0.98


def test_demix_accepts_flac_and_ogg_bytes(server, tmp_path):
    """/demix sniffs the container magic — FLAC and OGG bodies demix
    like WAV (load_audio dispatch, umx_tpu/io/audio.py)."""
    from scipy.io import wavfile

    flac_writer = pytest.importorskip("flac_writer")
    from umx_tpu.io import ogg as oggmod

    t = np.arange(44100) / 44100.0
    tone = np.stack(
        [0.4 * np.sin(2 * np.pi * 220 * t), 0.4 * np.sin(2 * np.pi * 330 * t)], axis=1
    )

    bodies = {}
    flac_path = str(tmp_path / "m.flac")
    flac_writer.write_flac(
        flac_path, np.round(tone * 32767.0).astype(np.int32), sample_rate=44100
    )
    bodies["flac"] = open(flac_path, "rb").read()

    if oggmod.available():
        ogg_writer = pytest.importorskip("ogg_writer")
        ogg_path = str(tmp_path / "m.ogg")
        ogg_writer.write_ogg(ogg_path, tone.astype(np.float32), 44100)
        bodies["ogg"] = open(ogg_path, "rb").read()

    for kind, body in bodies.items():
        req = urllib.request.Request(
            server + "/demix?shifts=0&wiener=1", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.status == 200, kind
            payload = r.read()
        with zipfile.ZipFile(io.BytesIO(payload)) as zf:
            total = 0
            for name in sorted(zf.namelist()):
                rate, data = wavfile.read(io.BytesIO(zf.read(name)))
                assert rate == 44100 and data.shape[1] == 2, kind
                total = total + data.astype(np.float64)
        n = min(len(total), len(tone))
        corr = np.corrcoef(total[:n].ravel(), tone[:n].ravel())[0, 1]
        assert corr > 0.97, (kind, corr)


def test_bad_requests(server):
    # wrong sample rate
    from scipy.io import wavfile

    buf = io.BytesIO()
    wavfile.write(buf, 48000, np.zeros((1000, 2), np.float32))
    req = urllib.request.Request(server + "/demix", data=buf.getvalue(), method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400

    # empty body
    req = urllib.request.Request(server + "/demix", data=b"", method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 400

    # unknown path
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(server + "/nope", timeout=60)
    assert exc.value.code == 404


def test_concurrent_requests_batch_on_device(server):
    """4 simultaneous /demix requests must all succeed and the service's
    batcher must have coalesced segments from different requests into
    shared device calls (the round-1 serialization lock is gone)."""
    from scipy.io import wavfile

    rng = np.random.default_rng(9)
    payloads = []
    for _ in range(4):
        buf = io.BytesIO()
        wavfile.write(buf, 44100, rng.uniform(-0.5, 0.5, (55125, 2)).astype(np.float32))
        payloads.append(buf.getvalue())

    # warm the compiled programs so coalescing isn't disturbed by compiles
    urllib.request.urlopen(server + "/warmup", timeout=600).read()
    req0 = urllib.request.Request(
        server + "/demix?shifts=0", data=payloads[0], method="POST"
    )
    urllib.request.urlopen(req0, timeout=600).read()
    _, before = _get(server + "/info")

    results = [None] * 4
    def post(i):
        req = urllib.request.Request(
            server + "/demix?shifts=0", data=payloads[i], method="POST"
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            results[i] = (r.status, r.read())

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(r is not None and r[0] == 200 for r in results)

    _, after = _get(server + "/info")
    new_jobs = after["batching"]["jobs"] - before["batching"]["jobs"]
    new_calls = after["batching"]["device_calls"] - before["batching"]["device_calls"]
    assert new_calls < new_jobs, (before, after)  # coalescing happened
    assert after["batching"]["max_batch_observed"] >= 2


def test_streaming_session_over_http(server):
    """/stream/start -> push in odd chunks -> close must reproduce the
    offline demix of the same audio (the streaming API's bit-exactness
    guarantee carried through the HTTP surface)."""
    rng = np.random.default_rng(17)
    n = int(1.3 * 44100)
    audio = rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32)

    with urllib.request.urlopen(
        urllib.request.Request(server + "/stream/start?wiener=1", method="POST"),
        timeout=600,
    ) as r:
        sid = json.loads(r.read())["session"]
    _, info = _get(server + "/info")
    assert info["streaming_sessions"] >= 1

    got = []
    pos = 0
    for size in (5000, 30000, 44100, n):  # odd chunk sizes, then the rest
        chunk = audio[:, pos : min(pos + size, n)]
        pos += chunk.shape[1]
        body = np.ascontiguousarray(chunk.T).tobytes()
        req = urllib.request.Request(
            server + f"/stream/push?session={sid}", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            m = int(r.headers["X-Stems-Samples"])
            payload = r.read()
        if m:
            got.append(np.frombuffer(payload, np.float32).reshape(4, 2, m))
        if pos >= n:
            break
    req = urllib.request.Request(
        server + f"/stream/close?session={sid}", data=b"", method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        m = int(r.headers["X-Stems-Samples"])
        if m:
            got.append(np.frombuffer(r.read(), np.float32).reshape(4, 2, m))
    stems = np.concatenate(got, axis=-1)
    assert stems.shape == (4, 2, n)

    # offline reference: rebuild the server's exact weights (synthetic
    # seed-0 dicts through the quantized ggml round trip) and demix the
    # same audio offline — streaming over HTTP must match
    from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
    from umx_tpu.engine.separator import Separator
    from umx_tpu.io.ggml import read_ggml_bytes, write_ggml_bytes
    from umx_tpu.models.umx import params_from_ggml, synthetic_state_dicts

    mcfg = ModelConfig(hidden_size=64)
    params = params_from_ggml(
        read_ggml_bytes(write_ggml_bytes(64, synthetic_state_dicts(mcfg, 0))), mcfg
    )
    cfg = EngineConfig(model=mcfg, segment=SegmentConfig(segment_secs=1.0), shifts=0)
    want = np.asarray(Separator(params, cfg).demix(audio, fused=False))
    np.testing.assert_allclose(stems, want, atol=1e-5)

    _, info = _get(server + "/info")
    assert info["streaming_sessions"] == 0  # session freed

    # unknown session -> 404
    req = urllib.request.Request(
        server + f"/stream/push?session=nope", data=b"\x00" * 8, method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=60)
    assert exc.value.code == 404


def test_streaming_session_ttl_eviction(tmp_path):
    """Abandoned streaming sessions must not brick /stream/start: idle
    sessions past session_ttl_s are evicted lazily, and the abandoning
    client's next push gets a distinct 'expired' error (round-3 verdict
    weak #5 — previously 16 dead clients exhausted the table forever)."""
    import time as _time

    from umx_tpu.config import ModelConfig
    from umx_tpu.io.ggml import write_ggml
    from umx_tpu.models.umx import synthetic_state_dicts
    from umx_tpu.serve import DemixService

    model_path = str(tmp_path / "model.bin.gz")
    write_ggml(model_path, 64, synthetic_state_dicts(ModelConfig(hidden_size=64), 0))
    svc = DemixService(model_path, segment_secs=1.0, session_ttl_s=0.25)
    try:
        # a fleet of clients opens sessions and walks away
        sids = [svc.stream_start(wiener=True) for _ in range(svc.max_sessions)]
        with pytest.raises(RuntimeError, match="too many streaming sessions"):
            svc.stream_start(wiener=True)

        _time.sleep(0.35)  # all sessions now past the TTL
        fresh = svc.stream_start(wiener=True)  # eviction unblocks the table
        assert len(svc._sessions) == 1

        # the abandoned client's next push: clear "expired", not "unknown"
        with pytest.raises(KeyError, match="expired"):
            svc.stream_push(sids[0], b"\x00" * 8)
        # a never-issued id still reads as unknown
        with pytest.raises(KeyError, match="unknown"):
            svc.stream_push("deadbeef0000", b"\x00" * 8)

        # the fresh session is alive and can be used then closed
        assert fresh in svc._sessions
        svc.stream_close(fresh)
        assert not svc._sessions
    finally:
        svc.batcher.close()
