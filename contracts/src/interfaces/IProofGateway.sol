// SPDX-License-Identifier: Apache-2.0
pragma solidity ^0.8.19;

/// @notice On-chain proof verification gateway: the consumer requests a
///         computation by function id + packed input, and later calls
///         `verifiedCall` to retrieve the proven output.
/// @dev Same role as the reference's ISuccinctGateway
///      (/root/reference/contracts/src/interfaces/ISuccinctGateway.sol:58-81)
///      for our own prover service.
interface IProofGateway {
    /// @notice Request an off-chain proof; the prover fulfills by calling
    ///         back `callbackSelector` on `callbackAddress`.
    function requestCall(
        bytes32 functionId,
        bytes calldata input,
        address callbackAddress,
        bytes calldata callbackData,
        uint32 callbackGasLimit
    ) external payable;

    /// @notice Returns the proven output for (functionId, input); reverts if
    ///         no verified proof is available.
    function verifiedCall(bytes32 functionId, bytes calldata input)
        external
        view
        returns (bytes memory output);
}
