"""Run every queries() entry twice in one Ray session and assert the sorted
results are identical — catches nondeterministic plans (unstable float
accumulation, order-dependent tie-breaks, racy state) that a single-shot
oracle comparison cannot.  Usage: PYTHONPATH=/root/repo python
scripts/determinism_check.py [sf_dir]."""

import sys

sys.path.insert(0, "/root/repo")


def main(sf: str = "/root/testdata/sf0.001") -> int:
    import numpy as np
    import pandas as pd
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as e

    def norm(r):
        df = r.to_pandas() if not isinstance(r, pd.DataFrame) else r
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    bad = []
    qs = e.queries()
    for name in sorted(qs):
        try:
            a = norm(qs[name](sf))
            b = norm(qs[name](sf))
            same = a.shape == b.shape
            if same:
                for c in a.columns:
                    av, bv = a[c].to_numpy(), b[c].to_numpy()
                    if av.dtype.kind == "f":
                        same = same and np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
                    else:
                        same = same and (av == bv).all()
            if not same:
                bad.append(name)
                print(f"NONDETERMINISTIC: {name}", flush=True)
        except Exception as ex:  # noqa: BLE001
            bad.append(name)
            print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:120]}", flush=True)
    print(f"DONE: {len(qs) - len(bad)}/{len(qs)} deterministic")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
