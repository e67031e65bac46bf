from geoglue_ray.cli import main

raise SystemExit(main())
