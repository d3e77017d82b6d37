"""HTTP client for the speechcatcher-data API.

Protocol parity with reference dataset.py:19-137: five REST endpoints
(start_training_session, get_next_batch, mark_batch_done, log,
end_training_session), keep-alive session with retry/backoff on 429/5xx, and
the same failure discipline (mark_batch_done and log are
logged-and-ignored on error; fetch raises so the caller can retry).

Multi-host note: under data-parallel training every host runs its own
``SpeechDataset`` session against the server (SURVEY.md §2.3) — the server's
session/batch protocol already coordinates many independent trainers
(reference README.md:14), so no cross-host data traffic is needed and each
carry-state row stays on the host that owns its utterance.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import numpy as np
import requests
import yaml
from requests.adapters import HTTPAdapter
from urllib3.util.retry import Retry

logger = logging.getLogger("statecatcher.data")

from statecatcher_tpu.data.audio import decode_audio_fast
from statecatcher_tpu.data.chunking import preprocess_recording


class SpeechDataset:
    """Streaming training-data client (reference dataset.py:19-266)."""

    def __init__(
        self,
        config_path: str = "config.yaml",
        verbose: bool = False,
        batch_segment_strategy: str = "clipping",
        batch_samplerate: int = 16000,
        config: Optional[dict] = None,
    ):
        if config is None:
            with open(config_path, "r") as f:
                config = yaml.safe_load(f)
        self.config = config
        self.api_key = self.config["secret_api_key"]
        self.api_url = self.config["server_api_url"].rstrip("/")
        self.language = self.config.get("podcast_language", "en")
        self.session_id: Optional[str] = None
        self.verbose = verbose
        self.batch_segment_strategy = batch_segment_strategy
        self.batch_samplerate = batch_samplerate

        # Keep-alive + retry/backoff, parity with reference dataset.py:36-56.
        self.session = requests.Session()
        retries = Retry(
            total=5, connect=5, read=5, backoff_factor=1.5,
            status_forcelist=[429, 500, 502, 503, 504],
            allowed_methods=["GET", "POST"],
        )
        adapter = HTTPAdapter(max_retries=retries, pool_connections=100, pool_maxsize=100)
        self.session.mount("http://", adapter)
        self.session.mount("https://", adapter)
        self.session.headers.update(
            {"Connection": "keep-alive", "User-Agent": "statecatcher-tpu-client"}
        )

    # ------------------------------------------------------------------ #
    # Session protocol
    # ------------------------------------------------------------------ #
    def start_session(self, batch_size=8, order="asc", min_duration=0.0, max_duration=None):
        url = f"{self.api_url}/start_training_session/{self.api_key}"
        payload = {
            "language": self.language,
            "batch_size": batch_size,
            "order": order,
            "min_duration": min_duration,
            "max_duration": max_duration,
        }
        resp = self.session.post(url, json=payload, timeout=10)
        resp.raise_for_status()
        result = resp.json()
        if not result.get("success"):
            raise RuntimeError(f"Failed to start session: {result.get('error')}")
        self.session_id = result["session_id"]
        if self.verbose:
            logger.info("Started session %s", self.session_id)

    def fetch_next_batch(self) -> tuple[int, Any, list]:
        """GET the next batch descriptor.  Raises RuntimeError on any
        transport, HTTP, or protocol failure — the training loop catches
        and retries (it must never die because the data server hiccuped)."""
        url = f"{self.api_url}/get_next_batch/{self.session_id}/{self.api_key}"
        try:
            resp = self.session.get(url, timeout=10)
        except requests.exceptions.RequestException as e:
            raise RuntimeError(f"get_next_batch transport failure: {e}") from e
        if not resp.ok:
            try:
                detail = resp.json()
            except Exception:
                detail = resp.text
            raise RuntimeError(f"get_next_batch HTTP {resp.status_code}: {detail}")
        result = resp.json()
        if not result.get("success"):
            raise RuntimeError(
                f"get_next_batch rejected by server: {result.get('error', '?')}"
            )
        return result["epoch"], result["batch_id"], result["batch"]

    def mark_batch_done(self, epoch, batch_id):
        """POST batch completion.  Best-effort: failures are logged and
        swallowed — the server will simply re-issue the batch."""
        url = f"{self.api_url}/mark_batch_done/{self.session_id}/{batch_id}/{self.api_key}?epoch={epoch}"
        try:
            resp = self.session.post(url, timeout=5)
        except Exception as e:
            logger.warning("mark_batch_done(%s, %s) transport failure: %s", epoch, batch_id, e)
            return
        if not resp.ok:
            logger.warning("mark_batch_done(%s, %s) HTTP %d", epoch, batch_id, resp.status_code)
            return
        result = resp.json()
        if not result.get("success"):
            logger.warning(
                "mark_batch_done(%s, %s) rejected: %s",
                epoch, batch_id, result.get("error", "?"),
            )

    def log(self, level: str, message: str):
        url = f"{self.api_url}/log/{self.session_id}/{self.api_key}"
        try:
            self.session.post(url, json={"level": level, "message": message}, timeout=5)
        except Exception:
            pass  # fire-and-forget, parity with reference dataset.py:121-128

    def end_session(self):
        url = f"{self.api_url}/end_training_session/{self.session_id}/{self.api_key}"
        try:
            self.session.post(url, timeout=5)
        except Exception:
            pass

    # ------------------------------------------------------------------ #
    # Per-item download + preprocess
    # ------------------------------------------------------------------ #
    def load_and_preprocess_batch_item(
        self, item: dict, target_samples: int
    ) -> tuple[list[np.ndarray], list[str], list[np.ndarray], list[dict]]:
        """Download one audio+VTT pair → fixed-size (segments, texts, masks, meta).

        URL-resolution parity with reference dataset.py:142-144 (including the
        ``/var/www/`` → ``https://`` rewrite fallback).
        """
        audio_url = item["cache_audio_url"]
        transcript_url = (
            item["transcript_file_url"]
            if "transcript_file_url" in item
            else item["transcript_file"].replace("/var/www/", "https://")
        )
        try:
            audio_resp = self.session.get(audio_url, timeout=10)
            audio_resp.raise_for_status()
        except Exception as e:
            raise RuntimeError(f"Failed to download audio: {e}")
        audio = decode_audio_fast(audio_resp.content, self.batch_samplerate)
        try:
            tr_resp = self.session.get(transcript_url, timeout=10)
            tr_resp.raise_for_status()
        except Exception as e:
            raise RuntimeError(f"Failed to fetch/parse transcript: {e}")
        return preprocess_recording(
            audio, tr_resp.text, self.batch_samplerate, target_samples
        )
