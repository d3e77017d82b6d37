"""xlstm package stub (NX-AI xLSTM is not in this image; the parity harness
runs the LSTM-CTC config).  reference model.py:6 imports this unconditionally."""
