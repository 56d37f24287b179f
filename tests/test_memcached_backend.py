"""Memcached FileClient backend against an in-process fake `mc` module.

The reference backend (Train/basicsr/utils/file_client.py:20-60) talks to
the `mc` client API: ``MemcachedClient.GetInstance(server_cfg,
client_cfg)``, ``Get(filepath, pyvector)``, ``ConvertBuffer(pyvector)``.
No memcached deployment or client library exists in this image, so the
test injects a fake module through the backend's own ``sys_path``
parameter (that parameter exists precisely to point at a non-installed
client library) and verifies the full key/round-trip protocol.
"""

import sys

import pytest

from rethink_acoustic_image_enhancement_tpu.data.file_client import FileClient

FAKE_MC = '''
"""Fake `mc` memcached client, file-backed like the real deployment."""

INSTANCES = []


class pyvector:
    def __init__(self):
        self.data = None


class MemcachedClient:
    def __init__(self, server_list_cfg, client_cfg):
        self.server_list_cfg = server_list_cfg
        self.client_cfg = client_cfg
        self.gets = []

    @staticmethod
    def GetInstance(server_list_cfg, client_cfg):
        inst = MemcachedClient(server_list_cfg, client_cfg)
        INSTANCES.append(inst)
        return inst

    def Get(self, filepath, buf):
        # the production deployment caches file contents keyed by path —
        # the fake serves straight from disk
        self.gets.append(filepath)
        with open(filepath, "rb") as f:
            buf.data = f.read()


def ConvertBuffer(buf):
    return buf.data
'''


@pytest.fixture
def fake_mc_dir(tmp_path):
    mod_dir = tmp_path / "fake_site"
    mod_dir.mkdir()
    (mod_dir / "mc.py").write_text(FAKE_MC)
    saved_path = list(sys.path)
    saved_mod = sys.modules.pop("mc", None)
    yield str(mod_dir)
    sys.path[:] = saved_path
    sys.modules.pop("mc", None)
    if saved_mod is not None:
        sys.modules["mc"] = saved_mod


def test_memcached_round_trip(fake_mc_dir, tmp_path):
    payload = b"\x89PNG fake bytes \x00\x01"
    f = tmp_path / "img.png"
    f.write_bytes(payload)

    client = FileClient("memcached",
                        server_list_cfg="/etc/mc/server_list.conf",
                        client_cfg="/etc/mc/client.conf",
                        sys_path=fake_mc_dir)
    assert client.get(str(f)) == payload
    # the configs must reach GetInstance untouched (file_client.py:47-49)
    import mc

    inst = mc.INSTANCES[-1]
    assert inst.server_list_cfg == "/etc/mc/server_list.conf"
    assert inst.client_cfg == "/etc/mc/client.conf"
    assert inst.gets == [str(f)]


def test_memcached_key_is_stringified(fake_mc_dir, tmp_path):
    """Path-like keys are coerced to str before hitting the client, the
    way every other backend stringifies (file_client.py:58)."""
    payload = b"abc123"
    f = tmp_path / "x.bin"
    f.write_bytes(payload)
    client = FileClient("memcached", server_list_cfg="s", client_cfg="c",
                        sys_path=fake_mc_dir)
    assert client.get(f) == payload  # pathlib.Path key
    import mc

    assert all(isinstance(k, str) for k in mc.INSTANCES[-1].gets)


def test_memcached_missing_client_raises_importerror(tmp_path):
    """Without the library (none installed here, and sys_path pointing
    nowhere useful), construction must fail with the explanatory
    ImportError, not an AttributeError later."""
    assert "mc" not in sys.modules
    empty = tmp_path / "empty_site"
    empty.mkdir()
    with pytest.raises(ImportError, match="mc"):
        FileClient("memcached", server_list_cfg="s", client_cfg="c",
                   sys_path=str(empty))
