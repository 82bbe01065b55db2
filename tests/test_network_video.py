"""netfs round-trip over localhost (netfs_server.cpp analogue) + video
sink fallback."""

import numpy as np

from granite_tpu.filesystem import Filesystem, MemoryBackend
from granite_tpu.network import NetfsBackend, NetfsServer


def test_netfs_roundtrip():
    store = MemoryBackend({"tex/a.bin": b"\x01\x02\x03",
                           "tex/b.bin": b"hello"})
    server = NetfsServer(store)
    server.start()
    try:
        client = NetfsBackend("127.0.0.1", server.port)
        assert client.read_file("tex/a.bin") == b"\x01\x02\x03"
        assert client.read_file("missing") is None
        assert client.stat("tex/b.bin")["size"] == 5
        assert sorted(client.list_dir("tex")) == ["a.bin", "b.bin"]
        assert client.write_file("tex/c.bin", b"xyz")
        assert store.files["tex/c.bin"] == b"xyz"
        # Mounted as a protocol it works through the router too.
        fs = Filesystem()
        fs.register_protocol("netfs", client)
        assert fs.read_file("netfs://tex/b.bin") == b"hello"
    finally:
        server.stop()


def test_video_sink_png_fallback(tmp_path):
    from granite_tpu.app.video_sink import VideoSink
    sink = VideoSink(str(tmp_path / "out.mp4"), 8, 8, fps=30)
    for i in range(3):
        frame = np.full((8, 8, 4), i * 10, np.uint8)
        sink.push_frame(frame)
    sink.close()
    import os
    frames_dir = str(tmp_path / "out_frames")
    if os.path.isdir(frames_dir):       # no ffmpeg in this environment
        assert len(os.listdir(frames_dir)) == 3
    else:
        assert os.path.exists(str(tmp_path / "out.mp4"))


def test_pyro_protocol_loopback():
    """pyro handshake + UDP frame streaming (video/pyro_protocol.h wire
    format: HELLO -> COOKIE -> UDP ack -> KICK -> CODEC_PARAMETERS, then
    packetized payload with BEGIN/KEY flags and seq fields)."""
    from granite_tpu.video.pyro import (
        CodecParameters, PyroClient, PyroServer, VIDEO_CODEC_PYROWAVE,
        make_message_type, message_length, validate_magic,
    )
    # Magic/typing helpers behave like the C macros.
    m = make_message_type(7, 24)
    assert validate_magic(m)
    assert message_length(m) == 24

    codec = CodecParameters(video_codec=VIDEO_CODEC_PYROWAVE,
                            width=320, height=180)
    srv = PyroServer(codec)
    srv.serve_handshake()
    cli = PyroClient("127.0.0.1", srv.tcp_port, srv.udp_port)
    got = cli.handshake()
    assert got.video_codec == VIDEO_CODEC_PYROWAVE
    assert (got.width, got.height) == (320, 180)

    frames = [bytes([i]) * (1500 + 700 * i) for i in range(3)]
    for i, f in enumerate(frames):
        srv.send_frame(f, key_frame=(i == 0))
    srv.send_frame(b"", key_frame=False)      # sentinel flushes frame 3
    received = [cli.recv_frame() for _ in range(3)]
    assert received == frames
    assert cli.reassembler.total_received_key_frames == 1
    srv.close()
    cli.close()
