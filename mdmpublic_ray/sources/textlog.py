"""Text-line log source (SURVEY.md §2.1 S5/S13): a deterministic
auth-log-style fixture + ``ray.data.read_text`` ingestion.

Models the reference's biggest text-operator family — ssh auth-log
parsing (``jenkins_scripts/report/ssh_login_report.sh:97-203``): accepted
/ failed logins (incl. "invalid user"), PAM session open/close pairs and
cron noise, in classic syslog line format. The fixture is generated from
a FIXED seed (sf-independent, like the reference's /var/log/auth.log —
one file per machine regardless of data scale) so the Ray pipeline and
the DuckDB oracle read byte-identical inputs at every sf.
"""

from __future__ import annotations

import datetime as _dt
import os
import random

FIXTURE_DIR = "/tmp/mdmpublic_ray_fixtures"
AUTH_LOG = os.path.join(FIXTURE_DIR, "auth.log")
N_LINES = 4000
_SEED = 42

_METHODS = ["password", "publickey"]
_USERS = ["alice", "bob", "carol", "dave", "eve", "mallory", "root", "deploy"]
_BAD_USERS = ["admin", "test", "oracle", "guest", "ubuntu"]


def auth_log_path() -> str:
    """Generate-if-missing and return the fixture path (atomic publish)."""
    if os.path.exists(AUTH_LOG):
        return AUTH_LOG
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng = random.Random(_SEED)
    hosts = [f"node{i:02d}" for i in range(8)]
    ips = [f"10.0.{rng.randrange(4)}.{rng.randrange(1, 255)}" for _ in range(40)]
    # days 10..27 only: syslog space-pads single-digit days, which would
    # complicate both parsers for zero coverage benefit
    t = _dt.datetime(2024, 1, 10, 0, 0, 0)
    pid = 1000
    open_sessions: list[tuple[str, int, str]] = []
    lines: list[str] = []
    for _ in range(N_LINES):
        t += _dt.timedelta(seconds=rng.randrange(1, 360))
        if t.day > 27:
            break
        ts = t.strftime("%b %d %H:%M:%S")
        host = rng.choice(hosts)
        r = rng.random()
        pid += 1
        if r < 0.30:
            line = (
                f"{ts} {host} sshd[{pid}]: Accepted {rng.choice(_METHODS)} for "
                f"{rng.choice(_USERS)} from {rng.choice(ips)} port "
                f"{rng.randrange(1024, 65000)} ssh2"
            )
        elif r < 0.55:
            if rng.random() < 0.3:
                who = f"invalid user {rng.choice(_BAD_USERS)}"
            else:
                who = rng.choice(_USERS)
            line = (
                f"{ts} {host} sshd[{pid}]: Failed password for {who} from "
                f"{rng.choice(ips)} port {rng.randrange(1024, 65000)} ssh2"
            )
        elif r < 0.70:
            user = rng.choice(_USERS)
            open_sessions.append((host, pid, user))
            line = (
                f"{ts} {host} sshd[{pid}]: pam_unix(sshd:session): "
                f"session opened for user {user} by (uid=0)"
            )
        elif r < 0.85 and open_sessions:
            h, p, user = open_sessions.pop(rng.randrange(len(open_sessions)))
            line = (
                f"{ts} {h} sshd[{p}]: pam_unix(sshd:session): "
                f"session closed for user {user}"
            )
        else:
            line = (
                f"{ts} {host} CRON[{pid}]: pam_unix(cron:session): "
                f"session opened for user root by (uid=0)"
            )
        lines.append(line)
    tmp = AUTH_LOG + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, AUTH_LOG)
    return AUTH_LOG


def read_log_lines(path: str | None = None):
    """Text-line source (S5/S13): one row per line, column ``text``."""
    import ray.data as rd

    return rd.read_text(path or auth_log_path())
