"""Thin spark-submit launcher: the engine package arrives via --py-files.

    spark-submit --master <...> --py-files dist/engine.zip \
        scripts/run_job.py <producer|pipeline|join> ...
"""

import sys

from engine.jobs import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
