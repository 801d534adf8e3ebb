"""Failure detection + graceful shutdown (training/signals.py).

The reference has no failure handling at all (SURVEY 5.3); this layer is
the TPU-production piece: pod preemptions deliver SIGTERM with a grace
period, and diverged runs must stop instead of writing NaN checkpoints.
"""

import math
import os
import signal

import pytest

from sambert_hifigan_tpu.training.signals import (
    GracefulShutdown,
    TrainingDiverged,
    check_finite_metrics,
)


class TestCheckFiniteMetrics:
    def test_finite_passes(self):
        check_finite_metrics({"total_loss": 1.5, "mel_loss": 0.0}, step=10)

    @pytest.mark.parametrize("bad", [float("nan"), float("inf"), -float("inf")])
    def test_non_finite_raises_with_names(self, bad):
        with pytest.raises(TrainingDiverged, match=r"step 7.*gen_loss"):
            check_finite_metrics(
                {"gen_loss": bad, "disc_loss": 1.0}, step=7
            )

    def test_multiple_bad_metrics_all_named(self):
        with pytest.raises(TrainingDiverged, match="disc_loss, gen_loss"):
            check_finite_metrics(
                {"gen_loss": math.nan, "disc_loss": math.inf, "ok": 1.0}, step=1
            )


class TestGracefulShutdown:
    def test_sigterm_sets_flag_without_killing(self):
        sd = GracefulShutdown(signals=(signal.SIGTERM,))
        try:
            assert sd.requested is False
            os.kill(os.getpid(), signal.SIGTERM)
            assert sd.requested is True  # process survived; loop will drain
        finally:
            sd.restore()

    def test_second_signal_escalates(self):
        sd = GracefulShutdown(signals=(signal.SIGTERM,))
        try:
            os.kill(os.getpid(), signal.SIGTERM)
            assert sd.requested
            with pytest.raises(KeyboardInterrupt):
                os.kill(os.getpid(), signal.SIGTERM)
        finally:
            sd.restore()

    def test_restore_reinstalls_previous_handler(self):
        seen = []
        prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
        try:
            sd = GracefulShutdown(signals=(signal.SIGTERM,))
            sd.restore()
            os.kill(os.getpid(), signal.SIGTERM)
            assert seen == [signal.SIGTERM]
        finally:
            signal.signal(signal.SIGTERM, prev)
