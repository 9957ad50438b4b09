#!/usr/bin/env bash
# Full test suite in CHUNKED pytest processes.
#
# Why not one `pytest tests/`: this pool's XLA:CPU native stack segfaults
# sporadically deep into a long-lived process — four full-suite runs died
# at 75-95% in four DIFFERENT tests, in compile (`backend_compile_and_load`)
# as well as executable-(de)serialization frames, including runs with the
# persistent cache fully disabled and zero concurrent load.  Fresh
# processes per chunk stay below the failure horizon; each chunk is an
# independent pytest run and the suite is green iff every chunk is.
# See DEVNOTES.md "XLA:CPU native-stack instability".
#
# Usage: ./run_tests.sh [extra pytest args]

set -u
cd "$(dirname "$0")"

N_CHUNKS=${N_CHUNKS:-4}
# The CLI combination matrix alone compiles a few hundred tiny XLA:CPU
# programs — it runs as its OWN pytest process (after the chunks) rather
# than stacking that onto a quarter of the suite (the SIGSEGV horizon).
mapfile -t FILES < <(ls tests/test_*.py | grep -v test_cli_matrix | sort)

declare -a CHUNKS
for idx in "${!FILES[@]}"; do
    c=$((idx % N_CHUNKS))
    CHUNKS[c]="${CHUNKS[c]:-} ${FILES[idx]}"
done

total_fail=0
for c in $(seq 0 $((N_CHUNKS - 1))); do
    # An empty chunk (N_CHUNKS > file count) would invoke pytest with no
    # paths, which collects the whole tests/ tree in one long-lived
    # process — the exact SIGSEGV scenario the chunking avoids.
    if [ -z "${CHUNKS[c]:-}" ]; then
        echo "=== chunk $((c + 1))/$N_CHUNKS === (empty, skipped)"
        continue
    fi
    echo "=== chunk $((c + 1))/$N_CHUNKS ==="
    # shellcheck disable=SC2086
    python -m pytest ${CHUNKS[c]} -q "$@"
    rc=$?
    if [ $rc -ne 0 ]; then
        echo "chunk $((c + 1)) FAILED (rc=$rc)"
        total_fail=1
    fi
done

echo "=== cli-matrix (dedicated process) ==="
python -m pytest tests/test_cli_matrix.py -q "$@"
if [ $? -ne 0 ]; then
    echo "cli-matrix FAILED"
    total_fail=1
fi

if [ $total_fail -eq 0 ]; then
    echo "ALL CHUNKS GREEN"
else
    echo "SUITE FAILED"
fi
exit $total_fail
