#!/bin/bash
set -u
echo "=== float32.segment.noflags.P1.r0"
"/root/repo/.golden/sweep/jobs/float32.segment.noflags.P1.r0/run.sh"
echo "=== float32.shift.noflags.P1.r0"
"/root/repo/.golden/sweep/jobs/float32.shift.noflags.P1.r0/run.sh"
echo "=== float32.shift_t.noflags.P1.r0"
"/root/repo/.golden/sweep/jobs/float32.shift_t.noflags.P1.r0/run.sh"
