"""Audio mixer subsystem (reference audio/audio_mixer.hpp:88-146 API
shape: slots + generation ids, bitmask states, gain/pan, play cursor,
kill/dispose GC, stream-stopped messages; dsp/ resampler)."""

import numpy as np

from granite_tpu.audio import (
    Mixer, NullBackend, SineStream, StreamState, WavFileBackend,
    WavStream, one_pole_filter, sinc_resample,
)


def test_mixer_stream_lifecycle_and_messages():
    m = Mixer()
    be = NullBackend(m, sample_rate=8000.0, block_frames=64)
    sid = m.add_mixer_stream(SineStream(1000.0, duration=0.01))
    assert sid >= 0
    assert m.get_stream_state(sid) == StreamState.Playing
    out = be.pull(160)                      # 0.02 s > duration
    assert np.abs(out).max() > 0.1
    # ended stream flags a kill + posts a message
    kind, mid = m.get_message_queue().get_nowait()
    assert kind == "stream_stopped" and mid == sid
    m.dispose_dead_streams()
    assert m.get_stream_state(sid) == StreamState.Dead
    assert m.get_play_cursor(sid) < 0
    # slot is reusable with a new generation; old id stays dead
    sid2 = m.add_mixer_stream(SineStream(500.0))
    assert Mixer.get_stream_index(sid2) == Mixer.get_stream_index(sid)
    assert sid2 != sid
    assert m.get_stream_state(sid2) == StreamState.Playing


def test_mixer_gain_pan_and_pause():
    m = Mixer()
    be = NullBackend(m, sample_rate=8000.0, block_frames=64)
    sid = m.add_mixer_stream(SineStream(400.0), initial_gain_db=0.0,
                             initial_panning=-1.0)     # hard left
    out = be.pull(128)
    assert np.abs(out[0]).max() > 0.5
    assert np.abs(out[1]).max() < 1e-5
    m.set_stream_mixer_parameters(sid, -20.0, 1.0)      # quiet right
    out = be.pull(128)
    assert np.abs(out[1]).max() < 0.2
    assert np.abs(out[0]).max() < 1e-5
    cursor = m.get_play_cursor(sid)
    assert cursor > 0
    assert m.pause_stream(sid)
    out = be.pull(64)
    assert np.abs(out).max() == 0.0
    assert m.get_play_cursor(sid) == cursor     # cursor frozen
    assert m.play_stream(sid)
    assert np.abs(be.pull(64)).max() > 0


def test_wav_stream_roundtrip(tmp_path):
    # write a 440 Hz wav at 22050, play through a 8000 Hz mixer
    import wave as wv
    path = str(tmp_path / "tone.wav")
    rate = 22050
    t = np.arange(rate // 10)
    pcm = (np.sin(2 * np.pi * 440.0 * t / rate) * 30000).astype(np.int16)
    with wv.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())

    m = Mixer()
    out_path = str(tmp_path / "mix.wav")
    be = WavFileBackend(out_path, m, sample_rate=8000.0)
    m.add_mixer_stream(WavStream(path))
    be.render(0.05)
    with wv.open(out_path, "rb") as w:
        assert w.getframerate() == 8000
        mixed = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    mixed = mixed.reshape(-1, 2).astype(np.float32) / 32768.0
    # dominant frequency stays 440 Hz after resampling
    spec = np.abs(np.fft.rfft(mixed[:, 0]))
    freq = np.fft.rfftfreq(len(mixed), 1 / 8000.0)
    assert abs(freq[spec.argmax()] - 440.0) < 30.0


def test_mixer_capacity():
    m = Mixer()
    NullBackend(m)
    ids = [m.add_mixer_stream(SineStream(100.0 + i)) for i in range(128)]
    assert all(s >= 0 for s in ids)
    assert m.add_mixer_stream(SineStream(9.0)) == -1   # full
    m.kill_stream(ids[5])
    m.dispose_dead_streams()
    assert m.add_mixer_stream(SineStream(9.0)) >= 0


def test_sinc_resample_preserves_tone():
    rate0, rate1 = 48000.0, 32000.0
    t = np.arange(4800)
    x = np.sin(2 * np.pi * 1000.0 * t / rate0).astype(np.float32)
    y = sinc_resample(x, rate0, rate1)
    assert abs(len(y) - 3200) <= 1
    spec = np.abs(np.fft.rfft(y[64:-64]))
    freq = np.fft.rfftfreq(len(y) - 128, 1 / rate1)
    assert abs(freq[spec.argmax()] - 1000.0) < 25.0


def test_one_pole_filter_smooths():
    x = np.zeros((64,), np.float32)
    x[0] = 1.0
    y = one_pole_filter(x, 0.9)
    assert y[0] > y[1] > y[2] > 0          # exponential decay
    assert np.allclose(y[1] / y[0], 0.9, atol=1e-5)
