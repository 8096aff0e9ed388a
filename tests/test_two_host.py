"""Two-host deployment e2e: parties in separate network namespaces connected
by a veth pair talk over the striped TCP mesh — the real (non-loopback)
deployment shape of the reference (mpc/netconnect.go:126-233,
config servers table).  Requires root + iproute2; skipped otherwise."""

import os
import subprocess
import sys
import textwrap

import pytest

NS1, NS2 = "sfgt_ns1", "sfgt_ns2"
IP1, IP2 = "10.247.1.1", "10.247.1.2"


def _have_netns():
    if os.geteuid() != 0:
        return False
    try:
        subprocess.run(["ip", "netns", "list"], check=True, capture_output=True)
        return True
    except Exception:
        return False


CHILD = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import numpy as np
    from sfgwas_tpu.parallel.transport import Network, make_tcp_transport

    pid = int(sys.argv[1])
    servers = {{
        0: {{"ip": {ip1!r}, "ports": {{1: 29460}}}},
        1: {{"ip": {ip2!r}, "ports": {{}}}},
    }}
    t = make_tcp_transport(pid, 2, servers, nchannel=2)
    net = Network(t, pid, 2, 1, None)
    arr = np.arange(400_000, dtype=np.uint64) * (pid + 1)
    got = net.exchange(arr, 1 - pid)
    want = np.arange(400_000, dtype=np.uint64) * (2 - pid)
    assert (got == want).all(), "exchange mismatch"
    # hub aggregation across the namespace boundary
    s = net.aggregate(np.full(8, pid + 1.0), lambda a, b: a + b, include_zero=True)
    assert (s == 3.0).all(), s
    net.close()
    print(f"party {{pid}} OK")
    """
)


@pytest.mark.skipif(not _have_netns(), reason="needs root + ip netns")
def test_two_netns_tcp_e2e(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = tmp_path / "child.py"
    child.write_text(CHILD.format(repo=repo, ip1=IP1, ip2=IP2))

    def sh(*cmd):
        subprocess.run(cmd, check=True, capture_output=True)

    try:
        for ns in (NS1, NS2):
            subprocess.run(["ip", "netns", "del", ns], capture_output=True)
        sh("ip", "netns", "add", NS1)
        sh("ip", "netns", "add", NS2)
        sh("ip", "link", "add", "sfgt_v1", "type", "veth", "peer", "name", "sfgt_v2")
        sh("ip", "link", "set", "sfgt_v1", "netns", NS1)
        sh("ip", "link", "set", "sfgt_v2", "netns", NS2)
        sh("ip", "-n", NS1, "addr", "add", IP1 + "/24", "dev", "sfgt_v1")
        sh("ip", "-n", NS2, "addr", "add", IP2 + "/24", "dev", "sfgt_v2")
        sh("ip", "-n", NS1, "link", "set", "sfgt_v1", "up")
        sh("ip", "-n", NS2, "link", "set", "sfgt_v2", "up")
        sh("ip", "-n", NS1, "link", "set", "lo", "up")
        sh("ip", "-n", NS2, "link", "set", "lo", "up")

        procs = [
            subprocess.Popen(
                ["ip", "netns", "exec", ns, sys.executable, str(child), str(pid)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for pid, ns in ((0, NS1), (1, NS2))
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
            assert p.returncode == 0, out
        assert "party 0 OK" in outs[0]
        assert "party 1 OK" in outs[1]
    finally:
        for ns in (NS1, NS2):
            subprocess.run(["ip", "netns", "del", ns], capture_output=True)
