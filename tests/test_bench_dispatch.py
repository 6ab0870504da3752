"""bench.py mode-dispatch contract.

The driver records the FINAL JSON line of ``python bench.py`` as the round's
headline number, so the xl (north-star) line must print last in every mode
that includes it, and in 'all' mode it must also carry the secondary sweep
values as extra fields. These tests stub the model builders and the timing
loop — they pin the dispatch/ordering logic only (the real numbers come from
the on-chip run; see CLAUDE.md "Current benchmark").
"""

import contextlib
import io
import json

import pytest

import bench


@pytest.fixture
def stubbed_bench(monkeypatch):
    def fake_run_mode(step, args, batch, iters, metric, baseline, img_idx,
                      report_compile=False):
        d = {'metric': metric, 'value': 1.0, 'unit': 'img/s/chip',
             'vs_baseline': 0.125}
        if report_compile:
            d['compile_s'] = 1.0
            d['compile_cached_s'] = 0.1
        return d

    # the backend probe spawns a subprocess that dials the real device
    # backend — irrelevant to (and flaky for) the dispatch contract
    monkeypatch.setattr(bench, '_wait_for_backend', lambda budget_s: 'cpu')
    monkeypatch.setattr(bench, 'run_mode', fake_run_mode)
    for name in ('bench_xl', 'bench_maps', 'bench_pixart', 'bench_flux',
                 'bench_hunyuan', 'bench_if'):
        monkeypatch.setattr(bench, name, lambda *a, **k: (None, None))
    return bench


def _run(monkeypatch, mode):
    monkeypatch.setenv('BENCH_MODE', mode)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    return [json.loads(l) for l in buf.getvalue().strip().splitlines()
            if l.startswith('{')]


XL_METRIC = 'sdxl_512_feature_extraction_throughput'


class TestBenchDispatch:
    def test_all_mode_headline_last_with_extras(self, stubbed_bench,
                                                monkeypatch):
        lines = _run(monkeypatch, 'all')
        assert len(lines) == 6
        assert lines[-1]['metric'] == XL_METRIC
        # every secondary metric rides on the headline line (all SIX modes
        # driver-visible since round 5, VERDICT r4 item 1)
        for k in ('maps_img_per_s', 'pixart_img_per_s', 'flux_int8_img_per_s',
                  'hunyuan_img_per_s', 'if_img_per_s'):
            assert k in lines[-1]
        # compile-time fields stay on the headline (VERDICT r2 item 7)
        assert 'compile_s' in lines[-1] and 'compile_cached_s' in lines[-1]
        secondary = {l['metric'] for l in lines[:-1]}
        assert secondary == {
            'sd15_512_attention_maps_extraction_throughput',
            'pixart_sigma_512_feature_extraction_throughput',
            'flux_dev_int8_512_feature_extraction_throughput',
            'hunyuan_dit_1024_feature_extraction_throughput',
            'if_i_l_64_feature_extraction_throughput',
        }

    def test_both_mode_headline_last(self, stubbed_bench, monkeypatch):
        lines = _run(monkeypatch, 'both')
        assert [l['metric'] for l in lines] == [
            'sd15_512_attention_maps_extraction_throughput', XL_METRIC]
        assert 'maps_img_per_s' in lines[-1]

    def test_single_modes_one_line(self, stubbed_bench, monkeypatch):
        for mode, metric in [
            ('xl', XL_METRIC),
            ('maps', 'sd15_512_attention_maps_extraction_throughput'),
            ('pixart', 'pixart_sigma_512_feature_extraction_throughput'),
            ('flux', 'flux_dev_int8_512_feature_extraction_throughput'),
            ('hunyuan', 'hunyuan_dit_1024_feature_extraction_throughput'),
            ('if', 'if_i_l_64_feature_extraction_throughput'),
        ]:
            lines = _run(monkeypatch, mode)
            assert len(lines) == 1 and lines[0]['metric'] == metric, mode

    def test_unknown_mode_raises(self, stubbed_bench, monkeypatch):
        monkeypatch.setenv('BENCH_MODE', 'bogus')
        with pytest.raises(ValueError):
            bench.main()

    def test_xl_img_override(self, stubbed_bench, monkeypatch):
        monkeypatch.setenv('BENCH_IMG', '1024')
        lines = _run(monkeypatch, 'xl')
        assert lines[0]['metric'] == 'sdxl_1024_feature_extraction_throughput'


class TestBackendWatchdog:
    """_wait_for_backend must fail fast-ish (bounded, nonzero exit, NO JSON
    on stdout) when the device backend never answers, and return the
    platform string when it does."""

    def test_gives_up_without_json(self, monkeypatch, capsys):
        import subprocess

        def never_answers(*a, **k):
            raise subprocess.TimeoutExpired(cmd='probe', timeout=0)

        monkeypatch.setattr('subprocess.run', never_answers)
        monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
        with pytest.raises(SystemExit) as ei:
            bench._wait_for_backend(0.0)
        assert ei.value.code == 1
        out = capsys.readouterr()
        assert '{' not in out.out          # no JSON line the driver could record
        assert 'unreachable' in out.err

    def test_returns_platform_when_up(self, monkeypatch):
        class Out:
            returncode = 0
            stdout = 'tpu\n'
            stderr = ''

        monkeypatch.setattr('subprocess.run', lambda *a, **k: Out())
        assert bench._wait_for_backend(10.0) == 'tpu'

    def test_fast_nonzero_probe_bails_immediately(self, monkeypatch, capsys):
        """A probe that exits nonzero QUICKLY is a broken install / bad
        flag, not a tunnel hang — retrying for the full budget cannot fix
        it; bail after 2 probes with the traceback tail (ADVICE r3)."""
        calls = []

        class Broken:
            returncode = 1
            stdout = ''
            stderr = 'Traceback ...\nRuntimeError: bad XLA flag'

        def run(*a, **k):
            calls.append(1)
            return Broken()

        monkeypatch.setattr('subprocess.run', run)
        monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
        with pytest.raises(SystemExit) as ei:
            bench._wait_for_backend(3600.0)   # huge budget must NOT be used
        assert ei.value.code == 1
        # 3 strikes: a restarting tunnel daemon refuses connections fast
        # for a few seconds — don't let two transient refusals abort a
        # round's only bench invocation
        assert len(calls) == 3
        out = capsys.readouterr()
        assert '{' not in out.out
        assert 'bad XLA flag' in out.err

    def test_last_probe_capped_to_remaining_budget(self, monkeypatch,
                                                   capsys):
        """The probe subprocess timeout must shrink to the remaining
        budget: otherwise the final probe overruns the deadline by up to
        its full 90 s and the driver kills bench at ITS timeout (rc=124,
        no reason line) — the exact failure mode the budget exists to
        prevent."""
        import subprocess
        timeouts = []

        def hang(*a, timeout=None, **k):
            timeouts.append(timeout)
            bench.time.sleep(timeout)
            raise subprocess.TimeoutExpired(cmd='probe', timeout=timeout)

        clock = [0.0]
        monkeypatch.setattr(bench.time, 'time', lambda: clock[0])
        monkeypatch.setattr(bench.time, 'sleep',
                            lambda s: clock.__setitem__(0, clock[0] + s))
        monkeypatch.setattr('subprocess.run', hang)
        with pytest.raises(SystemExit):
            bench._wait_for_backend(240.0)
        # every probe fits inside what was left of the budget (+10 s floor)
        assert all(t <= 90.0 for t in timeouts)
        assert clock[0] <= 240.0 + 10.0 + 30.0   # floor + one retry sleep
        assert '{' not in capsys.readouterr().out
