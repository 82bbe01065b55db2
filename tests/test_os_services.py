"""OS-services tests: VFS protocols + notifications (filesystem analogue),
ThreadGroup dependencies (thread_group_test.cpp port), AssetManager
budget/LRU behavior."""

import os
import time

import numpy as np

from granite_tpu.filesystem import (
    AssetClass, AssetManager, Filesystem, MemoryBackend, OSFilesystem,
)
from granite_tpu.filesystem.asset_manager import AssetInstantiatorInterface
from granite_tpu.threading_ import TaskComposer, ThreadGroup


def test_vfs_protocols(tmp_path):
    fs = Filesystem()
    fs.register_protocol("assets", OSFilesystem(str(tmp_path)))
    fs.register_protocol("builtin", MemoryBackend(
        {"shaders/x.comp": b"kernel"}))
    assert fs.write_file("assets://sub/hello.txt", "world")
    assert fs.read_file_to_string("assets://sub/hello.txt") == "world"
    assert fs.read_file("builtin://shaders/x.comp") == b"kernel"
    assert fs.stat("assets://sub/hello.txt")["size"] == 5
    assert "hello.txt" in fs.list_dir("assets://sub")
    assert fs.read_file("assets://missing") is None
    m = fs.map_file("assets://sub/hello.txt")
    assert bytes(m[:5]) == b"world"


def test_vfs_notifications(tmp_path):
    fs = Filesystem()
    fs.register_protocol("assets", OSFilesystem(str(tmp_path)))
    fs.write_file("assets://watch.me", "v1")
    events = []
    fs.install_notification("assets://watch.me", events.append)
    fs.poll_notifications()
    assert events == []
    time.sleep(0.01)
    fs.write_file("assets://watch.me", "v2")
    os.utime(os.path.join(str(tmp_path), "watch.me"))
    fs.poll_notifications()
    assert len(events) == 1 and events[0].type == "modified"


def test_thread_group_dependencies():
    tg = ThreadGroup(num_workers=4)
    order = []
    g1 = tg.create_task(lambda: order.append("a"))
    g2 = tg.create_task(lambda: order.append("b"))
    g3 = tg.create_task(lambda: order.append("c"))
    g2.add_dependency(g1)
    g3.add_dependency(g2)
    g3.flush()
    g2.flush()
    g1.flush()
    assert g3.wait(5.0)
    assert order == ["a", "b", "c"]
    tg.shutdown()


def test_task_composer_pipeline():
    tg = ThreadGroup(num_workers=4)
    out = []
    comp = TaskComposer(tg)
    for stage in range(4):
        s = comp.begin_pipeline_stage(f"s{stage}")
        s.enqueue_task(lambda i=stage: out.append(i))
    final = comp.get_outgoing_task()
    assert final.wait(5.0)
    assert out == [0, 1, 2, 3]
    tg.shutdown()


class CountingInstantiator(AssetInstantiatorInterface):
    def __init__(self):
        self.released = []

    def instantiate(self, path, asset_class):
        return (f"payload:{path}", 100)

    def fallback(self, asset_class):
        return f"fallback:{asset_class.name}"

    def release(self, payload):
        self.released.append(payload)


def test_asset_manager_budget_lru():
    tg = ThreadGroup(num_workers=2)
    inst = CountingInstantiator()
    am = AssetManager(inst, tg)
    am.set_asset_budget(250)      # fits 2 of 100
    ids = [am.register_asset(f"tex{i}.png", AssetClass.COLOR)
           for i in range(3)]
    # Fallback until resident.
    assert am.get_asset(ids[0]).startswith("fallback")
    am.iterate()                   # kicks instantiation of tex0
    tg.wait_idle()
    am.iterate()                   # publishes tex0
    assert am.get_asset(ids[0]) == "payload:tex0.png"
    # Touch 1 and 2, iterate twice to stream them in.
    am.get_asset(ids[1])
    am.get_asset(ids[2])
    am.iterate()
    tg.wait_idle()
    am.iterate()
    # Budget 250 forces eviction of the least recently used.
    resident = [am._assets[i].resident for i in ids]
    assert sum(resident) <= 2
    assert am.current_cost <= 250
    assert inst.released           # something was evicted
    tg.shutdown()


def test_asset_manager_dedup():
    tg = ThreadGroup(num_workers=1)
    am = AssetManager(CountingInstantiator(), tg)
    a = am.register_asset("same.png")
    b = am.register_asset("same.png")
    assert a == b
    tg.shutdown()


def test_inotify_notifications(tmp_path):
    """Linux inotify backend (raw libc): create/modify/delete events
    delivered without mtime-resolution races."""
    from granite_tpu.filesystem.vfs import OSFilesystem, _Inotify
    try:
        _Inotify().close()
    except OSError:
        import pytest
        pytest.skip("no inotify on this kernel")
    fs = OSFilesystem(str(tmp_path))
    assert fs._ino is not None
    events = []
    h = fs.install_notification("watched.txt", events.append)
    assert h > 0 and h in fs._ino_watch
    (tmp_path / "watched.txt").write_bytes(b"one")
    fs.poll_notifications()
    kinds = [e.type for e in events]
    assert "created" in kinds or "modified" in kinds
    events.clear()
    (tmp_path / "watched.txt").write_bytes(b"two")
    fs.poll_notifications()
    assert any(e.type == "modified" for e in events)
    events.clear()
    (tmp_path / "other.txt").write_bytes(b"x")   # unwatched file
    (tmp_path / "watched.txt").unlink()
    fs.poll_notifications()
    assert [e.type for e in events] == ["deleted"]
    fs.uninstall_notification(h)
    (tmp_path / "watched.txt").write_bytes(b"three")
    fs.poll_notifications()
    assert events[-1].type == "deleted"          # no new deliveries


def test_inotify_directory_watch(tmp_path):
    from granite_tpu.filesystem.vfs import OSFilesystem, _Inotify
    try:
        _Inotify().close()
    except OSError:
        import pytest
        pytest.skip("no inotify on this kernel")
    fs = OSFilesystem(str(tmp_path))
    sub = tmp_path / "assets"
    sub.mkdir()
    events = []
    fs.install_notification("assets", events.append)
    (sub / "a.bin").write_bytes(b"a")
    fs.poll_notifications()
    assert any(e.type in ("created", "modified") for e in events)
