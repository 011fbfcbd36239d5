# Canonical recipes — same verbs as the reference Makefile, driving the
# TPU-native framework. CONFIG/DATA knobs are overridable:
#   make federated_secure CONFIG=configs/torch/pneumonia-resnet-pretrained-fast.ini

CONFIG ?= configs/torch/pneumonia-resnet-pretrained.ini
DATA ?= data/server_simulation
WEIGHTS ?= model_weights/final.pt

# ---------------------------------------------------------------- setup

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# -------------------------------------------------------------- cleanup

clean_python:
	rm -rf .pytest_cache primia_tpu/__pycache__ primia_tpu/*/__pycache__ __pycache__

clean_weights:
	rm -rf model_weights

clean_server_folders:
	cd data/server_simulation 2>/dev/null && rm -rf validation worker1 worker2 worker3 || true

clean_all: clean_python clean_weights clean_server_folders
	$(MAKE) -C native clean

# ------------------------------------------------------------- datasets

server_folders:
	python -m primia_tpu.data.distribute distribute --train_data_src data/train --dest $(DATA)

symbolic_server_folders:
	python -m primia_tpu.data.distribute distribute --train_data_src data/train --dest $(DATA) -s
	python -m primia_tpu.data.distribute stats --root $(DATA)

minimal_server_folders: symbolic_server_folders
	python -m primia_tpu.data.distribute trim --root $(DATA) -n 4 --yes
	python -m primia_tpu.data.distribute stats --root $(DATA)

# ------------------------------------------------------------- training

local:
	@echo Training locally
	python train.py --config $(CONFIG) --data_dir data/train

federated_secure:
	@echo Federated training with MPC secure aggregation (simulated mesh nodes)
	python train.py --config $(CONFIG) --train_federated --data_dir $(DATA)

federated_insecure:
	@echo Federated training with plain FedAvg
	python train.py --config $(CONFIG) --train_federated --data_dir $(DATA) --unencrypted_aggregation

dp_local:
	@echo DP-SGD training with the measured round-5 recipe (BASELINE.md)
	python train.py --config configs/torch/pneumonia-conv-dp.ini --data_dir data/train

dp_federated:
	@echo Per-node DP-SGD + MPC secure aggregation (reference exits on this combo)
	python train.py --config configs/torch/pneumonia-conv-dp-federated.ini --train_federated --data_dir $(DATA)

federated_gridnode_secure:
	python train.py --config $(CONFIG) --train_federated --websockets --data_dir $(DATA)

federated_gridnode_insecure:
	python train.py --config $(CONFIG) --train_federated --websockets --data_dir $(DATA) --unencrypted_aggregation

# --------------------------------------------------- grid node ensemble

gridnode:
	python -m primia_tpu.serve.launcher --config configs/websetting/config.csv --data_root $(DATA) --ini $(CONFIG)

data_owner:
	python -m primia_tpu.serve.node --id data_owner --port 8770 --data_directory .inference --config $(CONFIG)

crypto_provider:
	python -m primia_tpu.serve.node --id crypto_provider --port 8780

model_owner:
	python -m primia_tpu.serve.node --id model_owner --port 8771

inference_setup:
	$(MAKE) data_owner & $(MAKE) crypto_provider & $(MAKE) model_owner

# ------------------------------------------------------------ inference

encrypted_inference_local:
	@echo Local encrypted inference
	python inference.py --data_dir .inference --model_weights $(WEIGHTS) --encrypted_inference

encrypted_inference_ws:
	@echo Websocket encrypted inference
	python inference.py --data_dir .inference --model_weights $(WEIGHTS) --encrypted_inference --websockets_config configs/websetting/config_inference.csv

encrypted_inference_http:
	@echo HTTP encrypted inference
	python inference.py --data_dir .inference --model_weights $(WEIGHTS) --encrypted_inference --websockets_config configs/websetting/config_inference.csv --http_protocol

unencrypted_inference_ws:
	python inference.py --data_dir .inference --model_weights $(WEIGHTS) --websockets_config configs/websetting/config_inference.csv

unencrypted_inference_http:
	python inference.py --data_dir .inference --model_weights $(WEIGHTS) --websockets_config configs/websetting/config_inference.csv --http_protocol

.PHONY: native test bench clean_python clean_weights clean_server_folders clean_all \
	server_folders symbolic_server_folders minimal_server_folders local \
	federated_secure federated_insecure federated_gridnode_secure \
	federated_gridnode_insecure gridnode data_owner crypto_provider model_owner \
	inference_setup encrypted_inference_local encrypted_inference_ws \
	encrypted_inference_http unencrypted_inference_ws unencrypted_inference_http
