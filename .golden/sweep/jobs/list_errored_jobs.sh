#!/bin/bash
find "/root/repo/.golden/sweep/jobs" -name job-errored.txt | sort
