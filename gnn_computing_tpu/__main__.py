from gnn_computing_tpu.utils.cli import main

if __name__ == "__main__":
    main()
