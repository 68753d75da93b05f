from sfm_mvs_tpu.cli import main

raise SystemExit(main())
