"""Application shell: persisted config, sessions, bookmarks, CLI.

JSON replaces the reference's DataTree/tinyxml persistence stack
(ref: src/util/DataTree.* 1.7k LoC of typed-XML plumbing) — the *schema*
(what gets saved) is kept 1:1, the serialization is plain JSON.
"""

from cubicsdr_tpu.app.config import AppConfig, DeviceConfig  # noqa: F401
from cubicsdr_tpu.app.session import SessionMgr  # noqa: F401
from cubicsdr_tpu.app.bookmarks import BookmarkMgr, BookmarkEntry  # noqa: F401
