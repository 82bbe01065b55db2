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
