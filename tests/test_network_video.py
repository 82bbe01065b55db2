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


def test_pyro_fec_recovers_lost_subpacket():
    """XOR-stripe FEC: drop one data subpacket per stripe set; the
    reassembler rebuilds the frame from parity (pyro_protocol.h
    num_xor_blocks_even/odd contract)."""
    import random
    from granite_tpu.video.pyro import (
        PAYLOAD_PACKET_FEC_BIT, PayloadHeader, Reassembler, packetize,
    )
    rng = random.Random(4)
    frame = bytes(rng.randrange(256) for _ in range(5000))  # 5 subpkts
    dgs = packetize(frame, 7, key_frame=True, pts=123456789,
                    xor_blocks_even=1, xor_blocks_odd=1)
    hdr = PayloadHeader.unpack(dgs[0])
    assert hdr.payload_size == 5000
    assert hdr.num_fec_blocks == 2
    assert (hdr.pts_lo | (hdr.pts_hi << 32)) == 123456789
    # 5 data + 2 parity datagrams
    assert len(dgs) == 7
    assert PayloadHeader.unpack(dgs[5]).encoded & PAYLOAD_PACKET_FEC_BIT

    # Drop data subpacket 2 (even set) and 3 (odd set) — one per stripe.
    lossy = [d for i, d in enumerate(dgs) if i not in (2, 3)]
    r = Reassembler()
    for d in lossy:
        r.feed(d)
    out = r.flush()
    assert out == frame
    assert r.total_recovered_packets == 2

    # Losing TWO members of one stripe is unrecoverable.
    lossy2 = [d for i, d in enumerate(dgs) if i not in (0, 2)]
    r2 = Reassembler()
    for d in lossy2:
        r2.feed(d)
    assert r2.flush() is None
    assert r2.total_dropped_video_packets >= 1


def test_pyro_fec_recovers_tail_subpacket():
    from granite_tpu.video.pyro import Reassembler, packetize
    frame = bytes(range(256)) * 9 + b"tail"      # non-multiple size
    dgs = packetize(frame, 1, key_frame=False, xor_blocks_even=2,
                    xor_blocks_odd=2)
    n_data = (len(frame) + 1023) // 1024
    drop = n_data - 1                            # the short tail chunk
    r = Reassembler()
    for i, d in enumerate(dgs):
        if i != drop:
            r.feed(d)
    assert r.flush() == frame


def test_video_source_png_roundtrip(tmp_path):
    """VideoSink PNG fallback -> VideoSource playback (the
    ffmpeg_encode/ffmpeg_decode pair in this environment)."""
    import numpy as np
    from granite_tpu.app.video_sink import VideoSink
    from granite_tpu.app.video_source import VideoSource
    path = str(tmp_path / "clip.mp4")
    sink = VideoSink(path, 8, 6, fps=30)
    frames = [np.full((6, 8, 4), 40 * i + 10, np.uint8) for i in range(3)]
    for f in frames:
        sink.push_frame(f)
    sink.close()
    src = VideoSource(path, 8, 6)
    got = []
    while True:
        f = src.read_frame()
        if f is None:
            break
        got.append(f)
    src.close()
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert np.array_equal(a[..., :3], b[..., :3])
