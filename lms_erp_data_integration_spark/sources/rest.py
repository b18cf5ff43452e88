"""REST connector layer (SURVEY.md S6/S7/S9): the Canvas
provisioning-report source and SIS-import sink, re-expressed as
transport-agnostic connectors.

The reference couples these to ``canvasapi`` (``src/canvas.py:30-52``
report create/poll/download, ``:107-133`` import POST/poll). Here the
HTTP layer is an injectable ``transport`` callable so the engine core
stays self-contained and unit-testable offline; polling cadence matches
the reference (3 s report / 2 s import — ``src/canvas.py:40,129``).
Polling is driver-side orchestration, never a Spark job.
"""

from __future__ import annotations

import io
import time
import zipfile
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

# transport(method, url, payload) -> dict | bytes
Transport = Callable[[str, str, dict | None], dict | bytes]

REPORT_POLL_SECONDS = 3.0  # src/canvas.py:40
IMPORT_POLL_SECONDS = 2.0  # src/canvas.py:129


@dataclass
class ReportSource:
    """Async report source: create -> poll until complete -> download a
    zip of per-entity CSVs -> extract to a stage dir (S6 + S7)."""

    transport: Transport
    base_url: str
    poll_seconds: float = REPORT_POLL_SECONDS
    max_polls: int = 200

    def fetch(self, term_id: str, dest_dir: str) -> list[str]:
        report = self.transport(
            "POST", f"{self.base_url}/reports", {"term_id": term_id}
        )
        assert isinstance(report, dict)
        for _ in range(self.max_polls):
            status = self.transport(
                "GET", f"{self.base_url}/reports/{report['id']}", None
            )
            assert isinstance(status, dict)
            if status.get("status") == "complete":
                break
            time.sleep(self.poll_seconds)
        else:
            raise TimeoutError(f"report {report['id']} never completed")
        blob = self.transport("GET", status["attachment_url"], None)
        assert isinstance(blob, (bytes, bytearray))
        out: list[str] = []
        # spark.read.csv cannot open zips: explicit unzip (canvas.py:50-52)
        base = Path(dest_dir).resolve()
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            for name in zf.namelist():
                # zip-slip guard: a member named '../x' or '/abs/x' must
                # not escape dest_dir (extractall-equivalent sanitization)
                target = (base / name.lstrip("/")).resolve()
                if not target.is_relative_to(base):
                    raise ValueError(f"zip member escapes dest dir: {name!r}")
                target.parent.mkdir(parents=True, exist_ok=True)
                target.write_bytes(zf.read(name))
                out.append(str(target))
        return out


@dataclass
class SISImportSink:
    """Async SIS-import sink: POST a CSV payload, poll progress to 100
    (S9). The pipeline runner invokes one sink call per update file in
    FK order; statistics from the response feed the run report
    (``src/canvas.py:136-162``)."""

    transport: Transport
    base_url: str
    poll_seconds: float = IMPORT_POLL_SECONDS
    max_polls: int = 200
    results: list[dict] = field(default_factory=list)

    def __call__(self, name: str, csv_bytes: bytes) -> dict:
        imp = self.transport(
            "POST", f"{self.base_url}/sis_imports", {"file": name, "data": csv_bytes}
        )
        assert isinstance(imp, dict)
        for _ in range(self.max_polls):
            status = self.transport(
                "GET", f"{self.base_url}/sis_imports/{imp['id']}", None
            )
            assert isinstance(status, dict)
            if status.get("progress", 0) >= 100:
                self.results.append({"file": name, **status})
                return status
            time.sleep(self.poll_seconds)
        raise TimeoutError(f"sis import {imp['id']} never reached 100%")
