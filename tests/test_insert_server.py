"""NGPServer TCP protocol integration test: real sockets, real handshake,
real actions — with a tiny insertor on the procedural scene."""

import os
import socket
import struct
import threading
import types

import numpy as np
import jax.numpy as jnp
import pytest


class FakeViewer:
    """Minimal client speaking the length-prefixed protocol
    (reference insert/server.py)."""

    def __init__(self, port):
        self.s = socket.create_connection(("127.0.0.1", port), timeout=30)

    def recv(self):
        n = int.from_bytes(self._recvn(8), "little")
        return self._recvn(n)

    def _recvn(self, n):
        buf = b""
        while len(buf) < n:
            chunk = self.s.recv(n - len(buf))
            assert chunk, "connection closed"
            buf += chunk
        return buf

    def send(self, payload):
        self.s.sendall(len(payload).to_bytes(8, "little"))
        self.s.sendall(payload)

    def action(self, aid, body=b""):
        self.send(struct.pack("i", aid) + body)


@pytest.mark.slow
def test_server_protocol_roundtrip(tmp_path, monkeypatch):
    os.chdir(tmp_path)
    from tests.test_insertor import make_hparams
    from arnerf_tpu.datasets.synthetic import SyntheticConfig
    import arnerf_tpu.datasets as dsets
    from arnerf_tpu.insert.main import NGPInsertor, NGPServer
    from arnerf_tpu.models import grid_state_init

    hp = make_hparams(tmp_path)
    orig = dsets.dataset_dict["synthetic"]
    monkeypatch.setitem(
        dsets.dataset_dict, "synthetic",
        lambda **kw: orig(config=SyntheticConfig(
            img_wh=(16, 16), n_train=2, n_test=1, gt_samples=16), **kw))
    ins = NGPInsertor(hp)
    gs = grid_state_init(ins.cfg)
    G = ins.cfg.grid_size
    g = (np.arange(G) + 0.5) / G * 2 - 1
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    occ = (np.sqrt(X ** 2 + Y ** 2 + Z ** 2) < 0.6).astype(np.uint8)
    ins.grid_state = gs._replace(occ_flat=jnp.asarray(occ.reshape(-1)))
    ins.blender_trans = np.eye(4, dtype=np.float32)
    ins.blender_scale = 1.0

    server_holder = {}

    def run_server():
        srv = NGPServer(ins)
        server_holder["srv"] = srv
        srv.run()

    th = threading.Thread(target=run_server, daemon=True)
    th.start()
    import time
    # the server binds then blocks in accept(); ports auto-increment on
    # conflicts, so retry a small range
    viewer = None
    for _ in range(50):
        for port in range(5001, 5006):
            try:
                viewer = FakeViewer(port)
                break
            except OSError:
                continue
        if viewer:
            break
        time.sleep(0.2)
    assert viewer is not None

    # handshake: H, W, F + blender transform + scale
    h, w, f = struct.unpack("iif", viewer.recv())
    assert (h, w) == (ins.H, ins.W)
    trans = np.frombuffer(viewer.recv(), np.float32)
    assert trans.shape == (16,)
    (scale,) = struct.unpack("f", viewer.recv())
    assert scale == 1.0

    # action 2: camera pose (identity-ish GL pose at z=-1.2)
    pose_gl = np.eye(4, dtype=np.float32)
    pose_gl[2, 3] = -1.2
    viewer.action(2, struct.pack("f" * 16, *pose_gl.flatten()))

    # action 4: material
    viewer.action(4, struct.pack("fffff", 0.3, 0.8, 0.5, 0.4, 0.3))

    # action 6: render (info incomplete -> plain NeRF pose render) ->
    # server replies with the render-complete code 0
    viewer.action(6)
    (code,) = struct.unpack("i", viewer.recv())
    assert code == 0

    # action 13: rotate save index
    viewer.action(13, struct.pack("i", 3))
    assert server_holder["srv"].save_idx == 3 or True  # set asynchronously

    # action 10: toggle self-shadow off
    viewer.action(10, struct.pack("i", 0))

    # action 0: quit
    viewer.action(0)
    th.join(timeout=60)
    assert not th.is_alive()
    srv = server_holder["srv"]
    assert srv.save_idx == 3
    assert srv.sg_use_self_shadow is False
    assert srv.cam_pose is not None
    assert float(srv.rough) == pytest.approx(0.3)
