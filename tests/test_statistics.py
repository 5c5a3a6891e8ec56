"""Statistics counters / progress / logger
(reference include/mitsuba/core/statistics.h, logger.h capability)."""
import pytest
import io
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mitsuba_im_tpu.core import statistics as st
from mitsuba_im_tpu.core import logger as lg


class TestCounters:
    def test_number_and_format(self):
        st.reset_stats()
        c = st.counter("TestCat", "rays")
        c.incr(2_500_000)
        out = io.StringIO()
        text = st.print_stats(out)
        assert "TestCat" in text and "rays" in text and "2.500 M" in text

    def test_bytes_format(self):
        c = st.counter("TestCat", "mem", st.BYTES)
        c.reset()
        c.incr(3 * 1024 * 1024)
        assert st._format_value(c) == "3.00 MiB"

    def test_percentage(self):
        c = st.counter("TestCat", "hit rate", st.PERCENTAGE)
        c.reset()
        c.incr(25, base=100)
        assert "25.00 %" in st._format_value(c)

    def test_min_max(self):
        mn = st.counter("TestCat", "min t", st.MINIMUM)
        mn.reset()
        mn.incr(5.0)
        mn.incr(2.0)
        assert mn.value == 2.0
        mx = st.counter("TestCat", "max t", st.MAXIMUM)
        mx.reset()
        mx.incr(5.0)
        mx.incr(2.0)
        assert mx.value == 5.0

    def test_record_device_scalar(self):
        import jax.numpy as jnp

        st.counter("TestCat", "dev").reset()
        st.record("TestCat", "dev", jnp.float32(4.0))
        assert st.counter("TestCat", "dev").value == 4.0

    def test_registry_reuse(self):
        a = st.counter("TestCat", "same")
        b = st.counter("TestCat", "same")
        assert a is b

    @pytest.mark.slow
    def test_render_records_counters(self):
        """render_film publishes Render counters (renderjob stats analog)."""
        from __graft_entry__ import _tiny_cornell
        from mitsuba_im_tpu.render.job import render_film

        st.reset_stats()
        scene, settings = _tiny_cornell()
        settings.width = settings.height = 8
        render_film(scene, settings, spp=2)
        assert st.counter("Render", "Passes").value == 2
        assert st.counter("Render", "Camera rays generated").value == 128


class TestProgressTimer:
    def test_progress_bar(self):
        out = io.StringIO()
        pr = st.ProgressReporter("Rendering", 10, stream=out, min_interval=0)
        for i in range(11):
            pr.update(i)
        pr.finish()
        s = out.getvalue()
        assert "Rendering" in s and "100.0%" in s

    def test_timer(self):
        t = st.Timer()
        assert t.seconds >= 0.0
        t.reset()
        assert t.milliseconds < 1000.0


class TestLogger:
    def test_appender_and_levels(self):
        buf = io.StringIO()
        h = lg.add_stream_appender(buf, level=lg.EDebug)
        try:
            lg.Log(lg.EInfo, "hello %s", "world", component="test")
            lg.Log(lg.EDebug, "debug line", component="test")
        finally:
            lg.remove_appender(h)
        s = buf.getvalue()
        assert "hello world" in s and "debug line" in s
        assert "mitsuba_im_tpu.test" in s

    def test_file_appender(self, tmp_path):
        p = str(tmp_path / "render.log")
        h = lg.add_file_appender(p)
        try:
            lg.Log(lg.EWarn, "warned")
        finally:
            lg.remove_appender(h)
        assert "warned" in open(p).read()
