"""Operator-facing message injection — the reference's ``pyspider
send_message`` command (run.py:808-835) re-expressed for the Ray
pipeline: instead of an xmlrpc call into a live scheduler process, the
message is spooled as a JSON task file into ``<out_dir>/inbox/``; the
crawl loop ingests the inbox at the top of every round (the same
scheduler-inbox phase that handles rich follows), so it works against
a running crawl AND against one that will be resumed later.

CLI::

    python -m pyspider_ray.send_message --out /path/to/crawl PROJECT MESSAGE

MESSAGE parses as JSON when possible, else passes as a raw string.
"""

from __future__ import annotations

import json
import os
import time
import uuid


def message_task(project: str, message, sender: str = "__command__") -> dict:
    """The reference's send_task payload (run.py:826-835): a
    ``data:,on_message`` control task whose save carries (sender, msg);
    unique taskid per injection so repeated messages all fire."""
    return {
        "taskid": f"_on_message:cli:{uuid.uuid4().hex[:12]}",
        "project": project,
        "url": "data:,on_message",
        "fetch": {"save": json.dumps([sender, message])},
        "process": {"callback": "_on_message"},
        "schedule": {"priority": 9, "force_update": True},
    }


def send_message(out_dir: str, project: str, message) -> str:
    """Spool one message task; returns the inbox file path."""
    inbox = os.path.join(out_dir, "inbox")
    os.makedirs(inbox, exist_ok=True)
    path = os.path.join(
        inbox, f"msg-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump([message_task(project, message)], f)
    os.replace(tmp, path)   # atomic publish: the loop never sees halves
    return path


def drain_inbox(out_dir: str) -> list[dict]:
    """Consume every spooled task file; called by the crawl loop."""
    inbox = os.path.join(out_dir, "inbox")
    if not os.path.isdir(inbox):
        return []
    tasks: list[dict] = []
    for name in sorted(os.listdir(inbox)):
        if not name.endswith(".json"):
            continue
        path = os.path.join(inbox, name)
        try:
            with open(path) as f:
                loaded = json.load(f)
        except (OSError, ValueError):
            continue
        tasks.extend(loaded if isinstance(loaded, list) else [loaded])
        os.unlink(path)
    return tasks


def _main() -> None:
    import argparse
    ap = argparse.ArgumentParser(
        description="inject a message into a crawl's inbox")
    ap.add_argument("--out", required=True,
                    help="the crawl's out_dir (same as the crawl CLI)")
    ap.add_argument("project")
    ap.add_argument("message")
    args = ap.parse_args()
    try:
        message = json.loads(args.message)
    except ValueError:
        message = args.message
    path = send_message(args.out, args.project, message)
    print(json.dumps({"spooled": path}))


if __name__ == "__main__":
    _main()
