"""Native async dump writer: compile, round-trip, error handling."""

import os

import numpy as np
import pytest

from diffusion_feature_tpu.native import AsyncDumpWriter, native_available
from diffusion_feature_tpu.native.dump_writer import npy_header


class TestNpyHeader:
    def test_header_parses_back(self, tmp_path):
        arr = np.random.RandomState(0).rand(3, 5, 7).astype(np.float16)
        path = str(tmp_path / 'x.npy')
        with open(path, 'wb') as f:
            f.write(npy_header(arr))
            f.write(arr.tobytes())
        back = np.load(path)
        assert back.dtype == np.float16 and back.shape == (3, 5, 7)
        assert np.array_equal(back, arr)

    def test_header_alignment(self):
        arr = np.zeros((2, 2), np.float32)
        h = npy_header(arr)
        assert len(h) % 64 == 0


class TestAsyncDumpWriter:
    def test_native_builds(self):
        # g++ is baked into the image; the native path must be live
        assert native_available()

    def test_round_trip(self, tmp_path):
        w = AsyncDumpWriter(n_threads=2)
        assert w.is_native
        arrays = {f'a{i}': np.random.RandomState(i).rand(4, 8).astype(np.float16)
                  for i in range(6)}
        for name, arr in arrays.items():
            w.submit(str(tmp_path / 'nested' / f'{name}.npy'), arr)
        w.flush()
        for name, arr in arrays.items():
            back = np.load(str(tmp_path / 'nested' / f'{name}.npy'))
            assert np.array_equal(back, arr)
        w.close()

    def test_flush_raises_on_unwritable(self, tmp_path):
        w = AsyncDumpWriter(n_threads=1)
        if not w.is_native:
            pytest.skip('no native lib')
        # a path under a file (not a dir) cannot be created
        blocker = tmp_path / 'file'
        blocker.write_text('x')
        w.submit(str(blocker / 'sub' / 'y.npy'), np.zeros(3, np.float32))
        with pytest.raises(IOError):
            w.flush()
        w._pool = None   # drop without re-flushing the failed state

    def test_save_batch_with_writer(self, tmp_path):
        from diffusion_feature_tpu.io.dump import save_batch
        feats = {'layer-a': np.random.rand(2, 3, 4, 4).astype(np.float32)}
        with AsyncDumpWriter(2) as w:
            paths = save_batch(feats, str(tmp_path), batch_start_index=0,
                               writer=w)
        for p in paths:
            assert os.path.exists(p)
        assert np.load(paths[0]).shape == (3, 4, 4)


class TestPrefetchLoader:
    def test_order_and_batching(self):
        from diffusion_feature_tpu.io.prefetch import PrefetchLoader
        import time
        paths = [f'p{i}' for i in range(7)]
        def slow_load(p):
            time.sleep(0.01)
            return p.upper()
        loader = PrefetchLoader(paths, batch_size=3, loader=slow_load)
        assert len(loader) == 3
        got = list(loader)
        assert [b for b, _ in got] == [['p0','p1','p2'], ['p3','p4','p5'], ['p6']]
        assert got[0][1] == ['P0', 'P1', 'P2']
        assert got[2][1] == ['P6']

    def test_error_propagates(self):
        from diffusion_feature_tpu.io.prefetch import PrefetchLoader
        def bad(p):
            raise IOError('decode failed')
        loader = PrefetchLoader(['a'], 1, bad)
        with pytest.raises(IOError):
            list(loader)


class TestAsyncNpyReader:
    def test_native_builds(self):
        from diffusion_feature_tpu.native import native_reader_available
        assert native_reader_available(), 'g++ toolchain expected in this env'

    @pytest.mark.parametrize('dtype,order', [
        (np.float32, 'C'), (np.float16, 'C'), (np.uint8, 'C'),
        (np.int64, 'C'), (np.float32, 'F'),
    ])
    def test_round_trip_matches_np_load(self, tmp_path, dtype, order):
        from diffusion_feature_tpu.native import AsyncNpyReader
        rng = np.random.RandomState(3)
        arr = (rng.rand(4, 6, 5) * 100).astype(dtype)
        arr = np.asarray(arr, order=order)
        path = str(tmp_path / f'{np.dtype(dtype).name}_{order}.npy')
        np.save(path, arr)
        reader = AsyncNpyReader(n_threads=2)
        assert reader.is_native
        h = reader.submit(path)
        back = reader.get(h)
        reader.close()
        assert back.dtype == arr.dtype and back.shape == arr.shape
        assert np.array_equal(back, arr)

    def test_out_of_order_and_many(self, tmp_path):
        from diffusion_feature_tpu.native import AsyncNpyReader
        rng = np.random.RandomState(4)
        arrays, paths = [], []
        for i in range(12):
            a = rng.rand(8, 3).astype(np.float32)
            p = str(tmp_path / f'a{i}.npy')
            np.save(p, a)
            arrays.append(a)
            paths.append(p)
        reader = AsyncNpyReader(n_threads=4)
        handles = [reader.submit(p) for p in paths]
        # resolve in reverse submission order
        for h, a in list(zip(handles, arrays))[::-1]:
            assert np.array_equal(reader.get(h), a)
        reader.close()

    def test_missing_file_raises(self, tmp_path):
        from diffusion_feature_tpu.native import AsyncNpyReader
        reader = AsyncNpyReader(n_threads=1)
        if not reader.is_native:
            pytest.skip('no native toolchain')
        h = reader.submit(str(tmp_path / 'absent.npy'))
        with pytest.raises(IOError):
            reader.get(h)
        reader.close()

    def test_scalar_shape(self, tmp_path):
        from diffusion_feature_tpu.native import AsyncNpyReader
        path = str(tmp_path / 's.npy')
        np.save(path, np.float32(3.5))
        reader = AsyncNpyReader(n_threads=1)
        back = reader.get(reader.submit(path))
        reader.close()
        assert back.shape == () and float(back) == 3.5

    def test_returned_array_is_writable(self, tmp_path):
        """np.load returns writable arrays; the native reader must too
        (callers mutate features in place)."""
        from diffusion_feature_tpu.native import AsyncNpyReader
        path = str(tmp_path / 'w.npy')
        np.save(path, np.ones((4, 4), np.float32))
        reader = AsyncNpyReader(n_threads=1)
        arr = reader.get(reader.submit(path))
        reader.close()
        arr *= 2.0
        assert (arr == 2.0).all()

    def test_zero_size_array(self, tmp_path):
        """Empty payload: the C pool may hand back a NULL data pointer;
        get() must return an empty array, not crash on from_address(None)."""
        from diffusion_feature_tpu.native import AsyncNpyReader
        path = str(tmp_path / 'empty.npy')
        np.save(path, np.zeros((0, 5), np.float32))
        reader = AsyncNpyReader(n_threads=1)
        back = reader.get(reader.submit(path))
        reader.close()
        assert back.shape == (0, 5) and back.dtype == np.float32

    def test_structured_dtype_falls_back_to_np_load(self, tmp_path):
        """A structured-dtype .npy ('descr' as a field list) must fail the
        native header parse — not silently mis-parse the first field name
        as the dtype — and get() then np.loads the remembered path so
        legitimate exotic dtypes still read."""
        from diffusion_feature_tpu.native import AsyncNpyReader
        arr = np.zeros(4, dtype=[('a', '<f4'), ('b', '<i2')])
        arr['a'] = [1, 2, 3, 4]
        path = str(tmp_path / 'struct.npy')
        np.save(path, arr)
        reader = AsyncNpyReader(n_threads=1)
        if not reader.is_native:
            pytest.skip('no native toolchain')
        back = reader.get(reader.submit(path))
        reader.close()
        assert back.dtype == arr.dtype
        assert np.array_equal(back['a'], arr['a'])

    def test_missing_file_raises_with_reason(self, tmp_path):
        """A nonexistent path fails the native job AND the np.load fallback;
        the error from np.load carries the real reason (file not found),
        not an opaque job id."""
        from diffusion_feature_tpu.native import AsyncNpyReader
        reader = AsyncNpyReader(n_threads=1)
        if not reader.is_native:
            pytest.skip('no native toolchain')
        with pytest.raises(OSError):
            reader.get(reader.submit(str(tmp_path / 'nope.npy')))
        reader.close()

    def test_read_all_byte_cap(self, tmp_path):
        """max_bytes below a single file still makes progress (one job in
        flight at a time) and yields everything in order."""
        from diffusion_feature_tpu.native import AsyncNpyReader
        arrays, paths = [], []
        for i in range(5):
            a = np.full((64, 64), i, np.float32)   # 16 KiB each
            p = str(tmp_path / f'cap{i}.npy')
            np.save(p, a)
            arrays.append(a)
            paths.append(p)
        reader = AsyncNpyReader(n_threads=2)
        out = list(reader.read_all(paths, window=4, max_bytes=1))
        reader.close()
        assert len(out) == 5
        for a, b in zip(out, arrays):
            assert np.array_equal(a, b)

    def test_read_all_windowed_order(self, tmp_path):
        from diffusion_feature_tpu.native import AsyncNpyReader
        arrays, paths = [], []
        for i in range(10):
            a = np.full((3, 3), i, np.float32)
            p = str(tmp_path / f'w{i}.npy')
            np.save(p, a)
            arrays.append(a)
            paths.append(p)
        reader = AsyncNpyReader(n_threads=2)
        out = list(reader.read_all(paths, window=3))
        reader.close()
        assert len(out) == 10
        for a, b in zip(out, arrays):
            assert np.array_equal(a, b)
